"""Camera model + Jacobian tests against jax autodiff (stage 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_svo_tpu.config import CameraConfig
from stereo_svo_tpu.geometry import camera, se3, triangulate

CAM = CameraConfig()
RNG = np.random.default_rng(1)


def rand_points(n, depth=(1.0, 10.0)):
    z = RNG.uniform(*depth, size=n)
    u = RNG.uniform(50, CAM.width - 50, size=n)
    v = RNG.uniform(50, CAM.height - 50, size=n)
    uv = jnp.asarray(np.stack([u, v], -1), dtype=jnp.float32)
    return camera.backproject(CAM, uv, jnp.asarray(z, dtype=jnp.float32))


def test_project_backproject_roundtrip():
    x = rand_points(128)
    uv, valid = camera.project(CAM, x)
    assert bool(jnp.all(valid))
    x2 = camera.backproject(CAM, uv, x[..., 2])
    np.testing.assert_allclose(x2, x, rtol=1e-5, atol=1e-4)


def test_level_consistency():
    x = rand_points(32)
    uv0, _ = camera.project(CAM, x, level=0)
    uv2, _ = camera.project(CAM, x, level=2)
    np.testing.assert_allclose(uv0 / 4.0, uv2, rtol=1e-5, atol=1e-4)


def test_proj_jacobian_matches_autodiff():
    x = rand_points(16)
    J = camera.proj_jacobian(CAM, x)
    Jad = jax.vmap(jax.jacfwd(lambda p: camera.project(CAM, p)[0]))(x)
    np.testing.assert_allclose(J, Jad, rtol=1e-4, atol=1e-3)


def test_proj_pose_jacobian_matches_autodiff():
    x_world = rand_points(8)
    T = se3.exp(jnp.asarray(RNG.normal(size=6) * 0.1, dtype=jnp.float32))

    def f(xi, xw):
        xc = se3.transform(se3.retract(T, xi), xw)
        return camera.project(CAM, xc)[0]

    x_cam = se3.transform(T, x_world)
    J = camera.proj_pose_jacobian(CAM, x_cam)
    Jad = jax.vmap(lambda xw: jax.jacfwd(f)(jnp.zeros(6), xw))(x_world)
    np.testing.assert_allclose(J, Jad, rtol=1e-4, atol=1e-3)


def test_stereo_depth_roundtrip():
    z = jnp.asarray(RNG.uniform(0.5, 40.0, size=64), dtype=jnp.float32)
    d = camera.depth_to_disparity(CAM, z)
    z2 = camera.disparity_to_depth(CAM, d)
    np.testing.assert_allclose(z2, z, rtol=1e-5)


def test_two_view_triangulation_exact():
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.uniform(2.0, 20.0, size=64), dtype=jnp.float32)
    uv = jnp.asarray(np.stack([rng.uniform(50, CAM.width - 50, size=64),
                               rng.uniform(50, CAM.height - 50, size=64)], -1),
                     dtype=jnp.float32)
    x_ref = camera.backproject(CAM, uv, z)
    T_cr = se3.exp(jnp.asarray(
        np.concatenate([rng.normal(size=3) * 0.2, rng.normal(size=3) * 0.05]),
        dtype=jnp.float32))
    x_cur = se3.transform(T_cr, x_ref)
    f_ref = x_ref / x_ref[..., 2:3]
    f_cur = x_cur / x_cur[..., 2:3]
    depth, valid = triangulate.two_view_depth(T_cr, f_ref, f_cur)
    assert bool(jnp.all(valid))
    # float32 normal equations on small-baseline pairs: ~0.1% conditioning
    np.testing.assert_allclose(depth, x_ref[..., 2], rtol=5e-3, atol=1e-2)


def test_in_bounds():
    uv = jnp.asarray([[0.0, 0.0], [-1.0, 5.0], [751.0, 479.0], [752.0, 100.0]],
                     dtype=jnp.float32)
    m = camera.in_bounds(CAM, uv)
    assert m.tolist() == [True, False, True, False]
