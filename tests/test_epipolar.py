"""Per-seed epipolar-search depth-filter update (ops/depth_filter.
epipolar_search) — the reference DepthFilter's 1-D search along the
epipolar line for seeds the tracker lost (SURVEY.md §3.5).

Golden tests on the synthetic scene: the search must localize the true
correspondence within the posterior's μ±3σ segment, and a full
search+update cycle must shrink the posterior toward the true depth —
i.e. a KLT-lost seed still converges instead of starving on its budget.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stereo_svo_tpu.config import CameraConfig, SvoConfig
from stereo_svo_tpu.geometry import camera as cam_mod
from stereo_svo_tpu.geometry import se3
from stereo_svo_tpu.io import synthetic
from stereo_svo_tpu.ops import depth_filter, interp, pyramid
import pytest

pytestmark = pytest.mark.slow  # compile-heavy e2e tier

CAM = CameraConfig(fx=200.0, fy=200.0, cx=128.0, cy=96.0,
                   baseline=0.11, width=256, height=192)
# epi_samples pinned explicitly: these tests exercise the epipolar path
# itself (the engine DEFAULT is now 0 — r5 measured trade-off; the path
# stays opt-in, e.g. kitti_config)
CFG = SvoConfig(camera=CAM, num_levels=3, align_levels=3, klt_levels=3,
                epi_samples=16)
SCENE = synthetic.default_scene(0)


def _grid_uv(n=8, m=6, margin=42):
    us = np.linspace(margin, CAM.width - margin, n)
    vs = np.linspace(margin, CAM.height - margin, m)
    return jnp.asarray(np.stack(np.meshgrid(us, vs), -1).reshape(-1, 2),
                       np.float32)


def _two_views(dx=0.12, dz=0.1):
    T_wr = synthetic.trajectory_pose(jnp.asarray(0.0, jnp.float32))
    T_wc = se3.compose(T_wr, se3.make(jnp.eye(3),
                                      jnp.asarray([dx, 0.02, dz])))
    img_r = synthetic.render_view(CAM, T_wr, SCENE)
    img_c = synthetic.render_view(CAM, T_wc, SCENE)
    T_cr = se3.compose(se3.inverse(T_wc), T_wr)   # ref(kf) → cur
    return T_wr, img_r, img_c, T_cr


def test_epipolar_search_finds_true_correspondence():
    T_wr, img_r, img_c, T_cr = _two_views()
    uv = _grid_uv()
    N = uv.shape[0]
    z_gt = synthetic.gt_depth(CAM, T_wr, uv, SCENE)

    # posterior: biased mean, interval generously covering the truth
    mu = 1.0 / z_gt * 1.15
    sigma2 = (0.12 * mu) ** 2

    lv = 1
    pyr, _, _ = pyramid.build_with_gradients(img_r, CFG.num_levels)
    tmpl = interp.sample_patch(pyr[lv], uv * 0.5, CFG.klt_patch)

    pyr_c, _, _ = pyramid.build_with_gradients(img_c, CFG.num_levels)
    T_ck = jnp.broadcast_to(T_cr, (N, 3, 4))
    uv_hit, ok, score = depth_filter.epipolar_search(
        CAM, CFG, T_ck, uv, mu, sigma2, tmpl, pyr_c[lv],
        jnp.ones(N, bool), level=lv)

    # ground-truth correspondence
    p_ref = cam_mod.backproject(CAM, uv, z_gt)
    uv_gt, front = cam_mod.project(CAM, se3.transform(T_cr, p_ref))
    vis = np.asarray(front & cam_mod.in_bounds(CAM, uv_gt, margin=20))
    okn = np.asarray(ok) & vis
    # the prominence + ZNCC gates reject broad-peak (poorly localizable)
    # matches on this smooth synthetic texture — a meaningful fraction
    # must still pass, and those that pass must be accurate
    assert okn.sum() >= 10, (okn.sum(), vis.sum())
    err = np.linalg.norm(np.asarray(uv_hit - uv_gt), axis=1)[okn]
    # level-1 search: ~2px level-0 localization is in-spec
    assert np.median(err) < 2.0, np.median(err)


def test_lost_seed_converges_via_epipolar_updates():
    """Repeated epipolar observations must converge the posterior to the
    true depth — the KLT-lost seed no longer starves to death."""
    uv = _grid_uv()
    N = uv.shape[0]
    T_wr = synthetic.trajectory_pose(jnp.asarray(0.0, jnp.float32))
    z_gt = synthetic.gt_depth(CAM, T_wr, uv, SCENE)
    img_r = synthetic.render_view(CAM, T_wr, SCENE)
    lv = 1
    pyr_r, _, _ = pyramid.build_with_gradients(img_r, CFG.num_levels)
    tmpl = interp.sample_patch(pyr_r[lv], uv * 0.5, CFG.klt_patch)

    mu = 1.0 / z_gt * 1.2                    # 20% biased start
    sigma2 = (0.15 * mu) ** 2
    sigma2_init = sigma2
    a = jnp.full(N, 10.0)
    b = jnp.full(N, 10.0)
    z_range = jnp.clip(2.0 * mu, 0.5, 4.0)
    n_updates = jnp.zeros(N, jnp.int32)

    for i in range(1, 7):
        # sideways + forward camera motion (baseline for triangulation)
        T_wc = se3.compose(T_wr, se3.make(
            jnp.eye(3), jnp.asarray([0.08 * i, 0.015 * i, 0.05 * i])))
        img_c = synthetic.render_view(CAM, T_wc, SCENE)
        pyr_c, _, _ = pyramid.build_with_gradients(img_c, CFG.num_levels)
        T_ck = jnp.broadcast_to(
            se3.compose(se3.inverse(T_wc), T_wr), (N, 3, 4))
        uv_hit, ok, _ = depth_filter.epipolar_search(
            CAM, CFG, T_ck, uv, mu, sigma2, tmpl, pyr_c[lv],
            jnp.ones(N, bool), level=lv)
        upd = depth_filter.observe_and_update(
            CAM, CFG, T_ck, uv, uv_hit, mu, sigma2, a, b, z_range, ok,
            px_scale=jnp.full(N, 2.0))
        mu, sigma2, a, b = upd.mu, upd.sigma2, upd.a, upd.b
        n_updates = n_updates + upd.updated.astype(jnp.int32)

    updated = np.asarray(n_updates) >= 3
    assert updated.sum() >= N // 2, updated.sum()
    rel = np.abs(np.asarray(1.0 / mu - z_gt) / np.asarray(z_gt))[updated]
    start_rel = np.abs(1.0 / 1.2 - 1.0)     # initial 16.7% depth error
    assert np.median(rel) < 0.05, np.median(rel)
    assert np.median(rel) < start_rel
    # posterior uncertainty shrank vs the seed value
    ratio = np.asarray(sigma2 / sigma2_init)[updated]
    assert np.median(ratio) < 0.3, np.median(ratio)


def test_engine_step_epipolar_path_smoke():
    """step() with the epipolar path wired compiles and stays finite under
    a tiny config (the vmapped/batched paths are covered by
    tests/test_parallel.py)."""
    import __graft_entry__ as ge
    from stereo_svo_tpu.engine.state import init_state
    from stereo_svo_tpu.engine.step import make_step

    cfg = dataclasses.replace(ge._tiny_cfg(), epi_samples=8)
    fn = jax.jit(make_step(cfg))
    st = init_state(cfg)
    rng = np.random.default_rng(0)
    h, w = cfg.camera.height, cfg.camera.width
    l = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    r = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    st, _ = fn(st, l, r)
    st, out = fn(st, l, r)
    assert np.isfinite(np.asarray(out.T_wc)).all()
