"""Validation hardening (SURVEY.md §4.2.2-3, VERDICT r1 missing #1):
non-planar geometry (spheres → parallax layers + occlusion) and a
photometric nuisance model (exposure gain/bias, vignette, sensor noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_svo_tpu.config import CameraConfig, SvoConfig
from stereo_svo_tpu.engine import runner
from stereo_svo_tpu.eval import ate
from stereo_svo_tpu.io import synthetic

CAM = CameraConfig(fx=240.0, fy=240.0, cx=188.0, cy=120.0,
                   baseline=0.11, width=376, height=240)

CFG = SvoConfig(
    camera=CAM,
    grid_rows=10, grid_cols=13, max_features=130,
    num_levels=3, align_levels=3, klt_levels=3,
    stereo_max_disp=64, kf_min_tracked=40,
    border_margin=10,
)


def test_sphere_depth_matches_analytic():
    """gt_depth through _intersect returns the exact camera-frame z for a
    sphere placed on the optical axis."""
    center = jnp.asarray([0.0, 0.0, 5.0])
    sph = synthetic.Sphere(center, jnp.asarray(1.0, jnp.float32),
                           jnp.asarray([1.0, 0.0, 0.0]),
                           jnp.asarray([0.0, 1.0, 0.0]))
    scene = ((sph,), (synthetic._texture_params(0),))
    T = jnp.eye(4)[:3]                      # camera at origin
    uv = jnp.asarray([[CAM.cx, CAM.cy]])    # central ray
    d = synthetic.gt_depth(CAM, T, uv, scene)
    np.testing.assert_allclose(np.asarray(d), [4.0], atol=1e-4)
    # off-axis ray missing the sphere → inf
    uv2 = jnp.asarray([[CAM.cx + 150.0, CAM.cy]])
    d2 = synthetic.gt_depth(CAM, T, uv2, scene)
    assert np.isinf(np.asarray(d2))[0]


def test_cluttered_scene_has_occlusion_and_depth_layers():
    scene = synthetic.cluttered_scene(0)
    T = synthetic.trajectory_pose(jnp.asarray(0.5, jnp.float32))
    us = jnp.arange(0, CAM.width, 4, dtype=jnp.float32)
    vs = jnp.arange(0, CAM.height, 4, dtype=jnp.float32)
    uv = jnp.stack(jnp.meshgrid(us, vs), -1).reshape(-1, 2)
    d = np.asarray(synthetic.gt_depth(CAM, T, uv, scene))
    d = d.reshape(len(vs), len(us))
    assert d.min() < 6.0 and d.max() > 12.0          # depth layers
    jumps = np.abs(np.diff(d, axis=1)) > 2.0
    assert jumps.sum() > 20                          # occlusion boundaries
    img = synthetic.render_view(CAM, T, scene)
    assert float(img.std()) > 15.0                   # textured everywhere


def test_perturb_is_deterministic_and_bounded():
    scene = synthetic.default_scene(0)
    T = synthetic.trajectory_pose(jnp.asarray(0.0, jnp.float32))
    l, r = synthetic.render_stereo(CAM, T, scene)
    key = jax.random.PRNGKey(7)
    l1, r1 = synthetic.perturb_stereo(l, r, key)
    l2, r2 = synthetic.perturb_stereo(l, r, key)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert float(l1.min()) >= 0.0 and float(l1.max()) <= 255.0
    # the two eyes get independent noise but shared exposure
    assert not np.array_equal(np.asarray(l1 - l), np.asarray(r1 - r))
    # different keys → different frames
    l3, _ = synthetic.perturb_stereo(l, r, jax.random.PRNGKey(8))
    assert not np.array_equal(np.asarray(l1), np.asarray(l3))


@pytest.mark.slow
def test_e2e_cluttered_scene_tracks():
    """Full pipeline on the non-planar occluded scene."""
    lefts, rights, gt = synthetic.make_sequence(
        CAM, 30, dt=0.12, kind="arc", seed=0, scene_kind="clutter")
    traj, metrics = runner.run_sequence(CFG, lefts, rights)
    ok = metrics["tracking_ok"]
    assert ok.mean() >= 0.97, f"tracking lost at {np.where(~ok)[0]}"
    err = ate.ate_rmse(ate.positions(traj), ate.positions(gt))
    assert err < 0.03, f"ATE RMSE {err:.4f} m on cluttered scene"


def test_road_scene_is_deep_and_disparity_in_range():
    """KITTI-geometry sanity (VERDICT r2 weak #2): the road scene must
    span real driving depths AND keep disparity inside kitti_config's
    stereo search range along the forward trajectory."""
    from stereo_svo_tpu.config import kitti_config

    kc = kitti_config()
    cam = kc.camera
    scene = synthetic.road_scene(0)
    us = jnp.linspace(40, cam.width - 40, 24)
    vs = jnp.linspace(40, cam.height - 40, 12)
    uv = jnp.stack(jnp.meshgrid(us, vs), -1).reshape(-1, 2)
    for t in (0.0, 4.0, 7.9):
        T = synthetic.trajectory_pose(jnp.asarray(t, jnp.float32), "kitti")
        d = np.asarray(synthetic.gt_depth(cam, T, uv, scene))
        d = d[np.isfinite(d)]
        assert d.min() > 2.0 and d.max() > 30.0, (t, d.min(), d.max())
        disp = cam.fx * cam.baseline / d
        # every visible surface must be stereo-matchable
        assert disp.max() < kc.stereo_max_disp, (t, disp.max())


def test_kitti_trajectory_is_forward_dominant_with_yaw():
    ts = np.arange(100) * 0.08
    Ts = np.stack([np.asarray(synthetic.trajectory_pose(
        jnp.asarray(t, jnp.float32), "kitti")) for t in ts])
    pos = Ts[:, :, 3]
    fwd = pos[-1, 2] - pos[0, 2]
    lat = np.abs(pos[:, 0]).max()
    assert fwd > 8.0 and fwd / lat > 10.0          # forward-dominant
    # sustained yaw: R[0,2] ~ sin(yaw) reaches ≥ 0.1 rad somewhere
    yaw = np.arcsin(np.clip(Ts[:, 0, 2], -1, 1))
    assert np.abs(yaw).max() > 0.1


def test_dynamic_scene_mover_actually_moves():
    s0 = synthetic.dynamic_scene(0, t=0.0)
    s1 = synthetic.dynamic_scene(0, t=4.0)
    c0 = np.asarray(s0[0][-1].center)
    c1 = np.asarray(s1[0][-1].center)
    assert np.linalg.norm(c1 - c0) > 0.5
    # static primitives identical
    for a, b in zip(s0[0][:-1], s1[0][:-1]):
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


@pytest.mark.slow
def test_e2e_spin_in_plane_rotation_tracks():
    """Sustained roll (±14°) — in-plane rotation is the motion class
    axis-aligned patches and grid pooling handle worst (VERDICT r2 #10);
    the odometry must ride through it."""
    lefts, rights, gt = synthetic.make_sequence(
        CAM, 30, dt=0.12, kind="spin", seed=0)
    traj, metrics = runner.run_sequence(CFG, lefts, rights)
    ok = metrics["tracking_ok"]
    assert ok.mean() >= 0.97, f"tracking lost at {np.where(~ok)[0]}"
    err = ate.ate_rmse(ate.positions(traj), ate.positions(gt))
    assert err < 0.03, f"ATE RMSE {err:.4f} m under in-plane rotation"


@pytest.mark.slow
def test_e2e_dynamic_object_rejected():
    """A moving sphere violates the static-world assumption; its features
    must be killed by the outlier gates (reprojection kill, stereo
    consistency), not dragged into the map (VERDICT r2 missing #1)."""
    lefts, rights, gt = synthetic.make_sequence(
        CAM, 30, dt=0.12, kind="arc", seed=0, scene_kind="dynamic")
    traj, metrics = runner.run_sequence(CFG, lefts, rights)
    ok = metrics["tracking_ok"]
    assert ok.mean() >= 0.97, f"tracking lost at {np.where(~ok)[0]}"
    err = ate.ate_rmse(ate.positions(traj), ate.positions(gt))
    assert err < 0.035, f"ATE RMSE {err:.4f} m with a moving object"


@pytest.mark.slow
def test_e2e_motion_blur_tracks():
    """Shutter blur over 30% of the inter-frame motion smears gradients
    and FAST scores — the classic direct-method stressor."""
    lefts, rights, gt = synthetic.make_sequence(
        CAM, 30, dt=0.12, kind="arc", seed=0, motion_blur=0.3)
    traj, metrics = runner.run_sequence(CFG, lefts, rights)
    ok = metrics["tracking_ok"]
    assert ok.mean() >= 0.97, f"tracking lost at {np.where(~ok)[0]}"
    err = ate.ate_rmse(ate.positions(traj), ate.positions(gt))
    assert err < 0.035, f"ATE RMSE {err:.4f} m under motion blur"


@pytest.mark.slow
def test_e2e_photometric_perturbation_tracks():
    """Exposure jitter + vignette + noise must not break tracking: the
    aligner's residual model and ZNCC stereo matching absorb affine
    intensity changes."""
    lefts, rights, gt = synthetic.make_sequence(
        CAM, 30, dt=0.12, kind="arc", seed=0, perturb=True)
    traj, metrics = runner.run_sequence(CFG, lefts, rights)
    ok = metrics["tracking_ok"]
    assert ok.mean() >= 0.97, f"tracking lost at {np.where(~ok)[0]}"
    err = ate.ate_rmse(ate.positions(traj), ate.positions(gt))
    assert err < 0.03, f"ATE RMSE {err:.4f} m under perturbation"
