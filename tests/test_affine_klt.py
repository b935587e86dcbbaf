"""Affine-warped KLT templates (ops/klt.warp_template_level +
geometry/camera.affine_warp_matrix) — SVO's getWarpMatrixAffine analog.

Golden tests on the synthetic scene: the warp matrix must match its
geometric definition (scale under forward motion, rotation under roll), and
warped tracking must beat fronto-parallel tracking under large scale change.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from stereo_svo_tpu.config import CameraConfig, SvoConfig
from stereo_svo_tpu.geometry import camera as cam_mod
from stereo_svo_tpu.geometry import se3
from stereo_svo_tpu.io import synthetic
from stereo_svo_tpu.ops import klt, pyramid, solve
import pytest

pytestmark = pytest.mark.slow  # compile-heavy e2e tier

CAM = CameraConfig(fx=200.0, fy=200.0, cx=128.0, cy=96.0,
                   baseline=0.11, width=256, height=192)
CFG = SvoConfig(camera=CAM, num_levels=3, align_levels=3, klt_levels=2,
                klt_max_iters=12, klt_affine_warp=True)
SCENE = synthetic.default_scene(0)


def test_warp_matrix_forward_motion_is_scale():
    uv = jnp.asarray([[CAM.cx, CAM.cy]], jnp.float32)
    z = jnp.asarray([4.0], jnp.float32)
    # camera advances 2 m along +z: ref point at 4 m is at 2 m in cur
    T_cr = se3.make(jnp.eye(3), jnp.asarray([0.0, 0.0, -2.0]))
    A = cam_mod.affine_warp_matrix(CAM, uv, z, T_cr)
    np.testing.assert_allclose(np.asarray(A[0]), 2.0 * np.eye(2), atol=1e-4)


def test_warp_matrix_roll_is_rotation():
    uv = jnp.asarray([[CAM.cx, CAM.cy]], jnp.float32)
    z = jnp.asarray([4.0], jnp.float32)
    th = 0.3
    Rz = jnp.asarray([[np.cos(th), -np.sin(th), 0.0],
                      [np.sin(th), np.cos(th), 0.0],
                      [0.0, 0.0, 1.0]], jnp.float32)
    T_cr = se3.make(Rz, jnp.zeros(3))
    A = np.asarray(cam_mod.affine_warp_matrix(CAM, uv, z, T_cr)[0])
    np.testing.assert_allclose(A @ A.T, np.eye(2), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(A), 1.0, atol=1e-4)


def test_warp_template_identity_matches_stored():
    T_wc, img = _ref_view()
    pyr, gxs, gys = pyramid.build_with_gradients(img, CFG.num_levels)
    uv = _grid_uv()
    mask = jnp.ones(uv.shape[0], bool)
    tmpl = klt.make_template(pyr, gxs, gys, CFG, uv, mask)
    eye = jnp.broadcast_to(jnp.eye(2), (uv.shape[0], 2, 2))
    val, J, Hinv, contained = klt.warp_template_level(
        tmpl.big[0], eye, CFG.klt_patch)
    np.testing.assert_allclose(np.asarray(val), np.asarray(tmpl.patches[0]),
                               atol=0.75)
    assert bool(np.asarray(contained).all())  # identity warp stays inside


def _ref_view():
    T_wc = synthetic.trajectory_pose(jnp.asarray(0.0, jnp.float32))
    return T_wc, synthetic.render_view(CAM, T_wc, SCENE)


def _grid_uv(n=10, m=7, margin=40):
    us = np.linspace(margin, CAM.width - margin, n)
    vs = np.linspace(margin, CAM.height - margin, m)
    return jnp.asarray(np.stack(np.meshgrid(us, vs), -1).reshape(-1, 2),
                       np.float32)


def test_warped_tracking_beats_frontoparallel_under_scale():
    T_wc_ref, img_ref = _ref_view()
    # strong forward motion toward the scene → big scale change
    T_wc_cur = se3.compose(T_wc_ref,
                           se3.make(jnp.eye(3),
                                    jnp.asarray([0.05, 0.0, 1.4])))
    img_cur = synthetic.render_view(CAM, T_wc_cur, SCENE)

    pyr_r, gxs_r, gys_r = pyramid.build_with_gradients(img_ref, CFG.num_levels)
    pyr_c, _, _ = pyramid.build_with_gradients(img_cur, CFG.num_levels)

    uv_ref = _grid_uv()
    z_ref = synthetic.gt_depth(CAM, T_wc_ref, uv_ref, SCENE)
    mask = jnp.ones(uv_ref.shape[0], bool)
    tmpl = klt.make_template(pyr_r, gxs_r, gys_r, CFG, uv_ref, mask)

    T_cr = se3.compose(se3.inverse(T_wc_cur), T_wc_ref)
    p_ref = cam_mod.backproject(CAM, uv_ref, z_ref)
    p_cur = se3.transform(T_cr, p_ref)
    uv_gt, front = cam_mod.project(CAM, p_cur)
    vis = (front & cam_mod.in_bounds(CAM, uv_gt, margin=20)
           & (p_cur[:, 2] > 0.5))

    A = cam_mod.affine_warp_matrix(CAM, uv_ref, z_ref, T_cr)
    A_inv = solve.inv2x2(A)

    rng = np.random.default_rng(1)
    uv_init = uv_gt + jnp.asarray(rng.uniform(-1.5, 1.5, uv_gt.shape),
                                  jnp.float32)

    uv_w, ok_w, _ = klt.track(pyr_c, tmpl, CFG, uv_init, A_inv=A_inv)
    uv_f, ok_f, _ = klt.track(pyr_c, tmpl, CFG, uv_init)

    def med_err(uv, ok):
        sel = np.asarray(vis & ok)
        assert sel.sum() >= 10
        e = np.linalg.norm(np.asarray(uv - uv_gt), axis=1)[sel]
        return float(np.median(e))

    e_w = med_err(uv_w, ok_w)
    e_f = med_err(uv_f, ok_f)
    # warped templates must track accurately (<0.5 px) and beat the
    # fronto-parallel templates under ~1.5x scale change
    assert e_w < 0.5, (e_w, e_f)
    assert e_w < e_f, (e_w, e_f)


def test_engine_step_runs_with_affine_warp():
    import __graft_entry__ as ge
    import jax
    from stereo_svo_tpu.engine.state import init_state
    from stereo_svo_tpu.engine.step import make_step

    cfg = dataclasses.replace(ge._tiny_cfg(), klt_affine_warp=True)
    fn = jax.jit(make_step(cfg))
    st = init_state(cfg)
    rng = np.random.default_rng(0)
    h, w = cfg.camera.height, cfg.camera.width
    l = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    r = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    st, _ = fn(st, l, r)
    st, out = fn(st, l, r)
    assert np.isfinite(np.asarray(out.T_wc)).all()
