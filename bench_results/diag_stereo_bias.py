#!/usr/bin/env python
"""Measure stereo-match depth bias per depth band on the road scene."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from stereo_svo_tpu.config import kitti_config
from stereo_svo_tpu.frontend import detector
from stereo_svo_tpu.geometry import camera as cam_mod, se3
from stereo_svo_tpu.io import synthetic
from stereo_svo_tpu.ops import pyramid, stereo_match

cfg = kitti_config()
cam = cfg.camera
scene = synthetic.road_scene(0)
for t in (0.0, 4.0):
    T = synthetic.trajectory_pose(jnp.asarray(t, jnp.float32), "kitti")
    l, r = synthetic.render_stereo(cam, T, scene)
    pyr, gxs, gys = pyramid.build_with_gradients(l, cfg.num_levels)
    det = detector.detect(pyr, gxs[0], gys[0], cfg)
    disp, zncc, ok = stereo_match.match(l, r, det.uv, cfg.stereo_max_disp, cfg.stereo_patch)
    z_est = np.asarray(cam_mod.disparity_to_depth(cam, disp))
    z_gt = np.asarray(synthetic.gt_depth(cam, T, det.uv, scene))
    disp_gt = cam.fx * cam.baseline / z_gt
    m = np.asarray(det.valid & ok) & np.isfinite(z_gt) & (z_est > 0)
    lvl = np.asarray(det.level)
    print(f"t={t} n={m.sum()}")
    for lo, hi in ((2,8),(8,15),(15,30),(30,70)):
        sel = m & (z_gt >= lo) & (z_gt < hi)
        if sel.sum() < 3: continue
        rel = (z_est[sel] - z_gt[sel]) / z_gt[sel]
        derr = np.asarray(disp)[sel] - disp_gt[sel]
        print(f"  z {lo:2d}-{hi:2d}m n={sel.sum():4d} rel_z: mean {rel.mean():+.4f} med {np.median(rel):+.4f} std {rel.std():.4f} | disp_err px: mean {derr.mean():+.3f} med {np.median(derr):+.3f} | lvls {np.bincount(lvl[sel], minlength=4)}")
