"""KLT tracking, pose refinement, depth-filter unit/golden tests."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_svo_tpu.config import SvoConfig
from stereo_svo_tpu.frontend import detector, pose_refine
from stereo_svo_tpu.geometry import camera, se3
from stereo_svo_tpu.io import synthetic
from stereo_svo_tpu.ops import depth_filter, klt, pyramid
import pytest

pytestmark = pytest.mark.slow  # compile-heavy e2e tier

CFG = SvoConfig()
CAM = CFG.camera
RNG = np.random.default_rng(11)


# ---------- KLT ----------

def test_klt_recovers_shift():
    scene = synthetic.default_scene(2)
    img0 = synthetic.render_view(CAM, se3.identity(), scene)
    lv0, gx, gy = pyramid.build_with_gradients(img0, CFG.num_levels)
    det = detector.detect(lv0, gx[0], gy[0], CFG)
    tmpl = klt.make_template(lv0, gx, gy, CFG, det.uv, det.valid)

    # current frame: camera translated laterally → nearly uniform flow
    T1 = se3.exp(jnp.asarray([0.04, 0.02, 0.0, 0.0, 0.0, 0.0], jnp.float32))
    img1 = synthetic.render_view(CAM, T1, scene)
    lv1 = pyramid.build(img1, CFG.num_levels)

    # ground-truth correspondence: project the GT 3-D points into frame 1
    z = synthetic.gt_depth(CAM, se3.identity(), det.uv, scene)
    X = camera.backproject(CAM, det.uv, z)           # world == frame0 cam
    uv_gt, _ = camera.project(CAM, se3.transform(se3.inverse(T1), X))

    # init a few px off the truth
    uv_init = uv_gt + jnp.asarray(RNG.normal(0, 2.0, uv_gt.shape), jnp.float32)
    uv, ok, _ = jax.jit(lambda l, t, u: klt.track(l, t, CFG, u))(
        lv1, tmpl, uv_init)

    m = np.asarray(ok & det.valid)
    assert m.sum() > 80
    err = np.linalg.norm(np.asarray(uv - uv_gt)[m], axis=-1)
    assert np.median(err) < 0.25, f"median KLT error {np.median(err):.3f}px"
    assert np.mean(err < 1.0) > 0.85


# ---------- pose refinement ----------

def test_pose_refine_converges_from_perturbed_pose():
    n = 128
    z = RNG.uniform(2, 8, n)
    uv = np.stack([RNG.uniform(60, CAM.width - 60, n),
                   RNG.uniform(60, CAM.height - 60, n)], -1)
    X = np.asarray(camera.backproject(
        CAM, jnp.asarray(uv, jnp.float32), jnp.asarray(z, jnp.float32)))
    T_gt = se3.exp(jnp.asarray([0.1, -0.05, 0.2, 0.02, -0.03, 0.01],
                               jnp.float32))
    uv_obs, _ = camera.project(CAM, se3.transform(T_gt, jnp.asarray(X)))
    uv_obs = uv_obs + jnp.asarray(RNG.normal(0, 0.3, (n, 2)), jnp.float32)

    T0 = se3.compose(se3.exp(jnp.asarray([0.02, 0.01, -0.02, 0.004, 0.006,
                                          -0.003], jnp.float32)), T_gt)
    mask = jnp.ones(n, dtype=bool)
    T_est, inl, stats = jax.jit(
        lambda t, x, u, m: pose_refine.refine(CAM, CFG, t, x, u, m))(
            T0, jnp.asarray(X), uv_obs, mask)
    dr, dt = se3.distance(T_est, T_gt)
    assert float(dt) < 2e-3 and float(dr) < 5e-4
    assert int(stats["refine_inliers"]) > 120


def test_pose_refine_rejects_outliers():
    n = 100
    z = RNG.uniform(2, 8, n)
    uv = np.stack([RNG.uniform(60, CAM.width - 60, n),
                   RNG.uniform(60, CAM.height - 60, n)], -1)
    X = jnp.asarray(np.asarray(camera.backproject(
        CAM, jnp.asarray(uv, jnp.float32), jnp.asarray(z, jnp.float32))))
    T_gt = se3.exp(jnp.asarray([0.05, 0.0, 0.1, 0.0, 0.01, 0.0], jnp.float32))
    uv_obs, _ = camera.project(CAM, se3.transform(T_gt, X))
    # corrupt 15% of observations badly
    n_bad = 15
    bad = np.zeros(n, bool)
    bad[:n_bad] = True
    uv_obs = uv_obs.at[:n_bad].add(
        jnp.asarray(RNG.uniform(20, 60, (n_bad, 2)), jnp.float32))
    T_est, inliers, _ = pose_refine.refine(
        CAM, CFG, T_gt, X, uv_obs, jnp.ones(n, bool))
    inl = np.asarray(inliers)
    assert inl[:n_bad].sum() == 0, "outliers must be flagged"
    assert inl[n_bad:].mean() > 0.95
    dr, dt = se3.distance(T_est, T_gt)
    assert float(dt) < 2e-3


# ---------- depth filter ----------

def test_depth_update_shrinks_variance_toward_truth():
    n = 64
    z_true = jnp.asarray(RNG.uniform(2, 8, n), jnp.float32)
    mu = 1.0 / z_true * jnp.asarray(RNG.uniform(0.8, 1.2, n), jnp.float32)
    sigma2 = jnp.full((n,), 0.05 ** 2, jnp.float32)
    a = jnp.full((n,), 10.0, jnp.float32)
    b = jnp.full((n,), 10.0, jnp.float32)
    z_range = jnp.full((n,), 1.0, jnp.float32)
    tau2 = jnp.full((n,), 0.01 ** 2, jnp.float32)
    mask = jnp.ones(n, bool)

    for _ in range(20):
        x = 1.0 / z_true + jnp.asarray(RNG.normal(0, 0.01, n), jnp.float32)
        upd = depth_filter.update(mu, sigma2, a, b, x, tau2, z_range, mask)
        mu, sigma2, a, b = upd.mu, upd.sigma2, upd.a, upd.b
    assert bool(jnp.all(upd.updated))
    err = np.abs(np.asarray(mu - 1.0 / z_true))
    assert np.median(err) < 0.01
    assert float(jnp.median(jnp.sqrt(sigma2))) < 0.01
    assert bool(jnp.all(a / (a + b) > 0.5))


def test_depth_update_outliers_lower_inlier_ratio():
    n = 32
    mu = jnp.full((n,), 0.25, jnp.float32)
    sigma2 = jnp.full((n,), 1e-4, jnp.float32)
    a = jnp.full((n,), 10.0, jnp.float32)
    b = jnp.full((n,), 10.0, jnp.float32)
    z_range = jnp.full((n,), 1.0, jnp.float32)
    tau2 = jnp.full((n,), 1e-4, jnp.float32)
    a0_ratio = float((a / (a + b))[0])
    for _ in range(10):
        x = jnp.asarray(RNG.uniform(0.5, 1.0, n), jnp.float32)  # far off
        upd = depth_filter.update(mu, sigma2, a, b, x, tau2, z_range,
                                  jnp.ones(n, bool))
        mu, sigma2, a, b = upd.mu, upd.sigma2, upd.a, upd.b
    assert float((a / (a + b))[0]) < a0_ratio  # inlier belief dropped
    # the mean should have barely moved (outlier-robust)
    np.testing.assert_allclose(np.asarray(mu), 0.25, atol=0.05)


def test_observe_and_update_from_geometry():
    """Seeds observed from a translated camera converge to GT depth."""
    n = 48
    z_true = jnp.asarray(RNG.uniform(2, 6, n), jnp.float32)
    kf_uv = jnp.asarray(np.stack([RNG.uniform(100, 650, n),
                                  RNG.uniform(80, 400, n)], -1), jnp.float32)
    X_kf = camera.backproject(CAM, kf_uv, z_true)

    mu = 1.0 / z_true * 1.15          # 15% depth error initially
    sigma2 = jnp.full((n,), 0.03 ** 2, jnp.float32)
    a = jnp.full((n,), 10.0, jnp.float32)
    b = jnp.full((n,), 10.0, jnp.float32)
    z_range = jnp.full((n,), 0.5, jnp.float32)

    for i in range(1, 9):
        T_ck = se3.exp(jnp.asarray([0.05 * i, 0.02 * i, 0.0, 0.0, 0.0, 0.0],
                                   jnp.float32))
        uv_cur, _ = camera.project(CAM, se3.transform(T_ck, X_kf))
        T_ck_b = jnp.broadcast_to(T_ck, (n, 3, 4))
        upd = depth_filter.observe_and_update(
            CAM, CFG, T_ck_b, kf_uv, uv_cur, mu, sigma2, a, b, z_range,
            jnp.ones(n, bool))
        mu, sigma2, a, b = upd.mu, upd.sigma2, upd.a, upd.b
    rel = np.abs(np.asarray(1.0 / mu - z_true) / np.asarray(z_true))
    assert np.median(rel) < 0.01, f"median depth err {np.median(rel):.3f}"
    conv = depth_filter.converged(CFG, mu, sigma2)
    assert float(jnp.mean(conv)) > 0.8


def test_klt_edgelet_constraint():
    """Edgelet features must only move along their gradient normal: on a
    vertical-edge image the u-update is free but v must stay put."""
    import jax.numpy as jnp
    from stereo_svo_tpu.ops import klt as klt_ops, pyramid as pyr_ops

    H, W = 64, 256
    x = np.arange(W, dtype=np.float32)
    # smooth vertical edge at x=128 (no horizontal texture)
    img0 = np.tile(200.0 / (1 + np.exp(-(x - 128.0) / 2.0)), (H, 1))
    img1 = np.tile(200.0 / (1 + np.exp(-(x - 131.0) / 2.0)), (H, 1))

    # epi_samples=0: the depth filter's epipolar search reuses KLT
    # template patches and its validation rejects klt_levels=1 with the
    # default epi_level=1 (config.__post_init__, r3) — no depth filter
    # runs in this unit test
    cfg2 = SvoConfig(
        camera=CFG.camera, klt_levels=1, klt_max_iters=12, klt_patch=8,
        epi_samples=0)
    lv0, gx0, gy0 = pyr_ops.build_with_gradients(
        jnp.asarray(img0), cfg2.num_levels)
    n = 4
    uv = jnp.asarray([[128.0, 20.0], [128.0, 30.0], [128.0, 40.0],
                      [128.0, 50.0]], jnp.float32)
    mask = jnp.ones(n, bool)
    tmpl = klt_ops.make_template(lv0, gx0, gy0, cfg2, uv, mask)
    lv1 = pyr_ops.build(jnp.asarray(img1), cfg2.num_levels)

    edge_dir = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (n, 1))
    uv_out, ok, _ = klt_ops.track(lv1, tmpl, cfg2, uv,
                                  edge_dir=edge_dir,
                                  is_edgelet=jnp.ones(n, bool))
    # recovered the 3px shift along the normal…
    np.testing.assert_allclose(np.asarray(uv_out[:, 0]), 131.0, atol=0.2)
    # …and did not drift along the (unobservable) edge direction
    np.testing.assert_allclose(np.asarray(uv_out[:, 1]),
                               np.asarray(uv[:, 1]), atol=1e-3)
