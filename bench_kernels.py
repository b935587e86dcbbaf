#!/usr/bin/env python
"""Per-stage micro-benchmarks of the SVO pipeline on the current backend.

Identifies where the per-frame millisecond budget goes (SURVEY.md §7.3.5)
so kernel work (Pallas) targets the real hotspots. Run on TPU (default env)
or CPU (PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from stereo_svo_tpu.config import SvoConfig
from stereo_svo_tpu.engine import runner, state as state_mod, step as step_mod
from stereo_svo_tpu.frontend import detector, keyframe, pose_refine
from stereo_svo_tpu.geometry import se3
from stereo_svo_tpu.io import synthetic
from stereo_svo_tpu.ops import align, depth_filter, klt, pyramid, stereo_match, fast
from stereo_svo_tpu.utils.profiling import time_fn


def main():
    cfg = SvoConfig()
    cam = cfg.camera
    scene = synthetic.default_scene(0)
    img_l, img_r = jax.jit(
        lambda: synthetic.render_stereo(cam, se3.identity(), scene))()
    pyr, gxs, gys = pyramid.build_with_gradients(img_l, cfg.num_levels)

    det = detector.detect(pyr, gxs[0], gys[0], cfg)
    z = synthetic.gt_depth(cam, se3.identity(), det.uv, scene)
    tmpl = align.make_template(pyr, gxs, gys, cam, cfg, det.uv, z, det.valid)
    ktmpl = klt.make_template(pyr, gxs, gys, cfg, det.uv, det.valid)

    results = {}

    f_pyr = jax.jit(lambda i: pyramid.build_with_gradients(i, cfg.num_levels))
    results["pyramid_ms"] = time_fn(f_pyr, img_l) * 1e3

    f_fast = jax.jit(fast.corner_score)
    results["fast_score_l0_ms"] = time_fn(f_fast, pyr[0]) * 1e3

    f_det = jax.jit(lambda p, gx, gy: detector.detect(p, gx, gy, cfg))
    results["detector_ms"] = time_fn(f_det, pyr, gxs[0], gys[0]) * 1e3

    f_align = jax.jit(
        lambda p, t: align.align(p, t, cam, cfg, se3.identity()))
    results["align_ms"] = time_fn(f_align, pyr, tmpl) * 1e3

    f_tmpl = jax.jit(lambda p, gx, gy, uv, zz, m: align.make_template(
        p, gx, gy, cam, cfg, uv, zz, m))
    results["align_template_ms"] = time_fn(
        f_tmpl, pyr, gxs, gys, det.uv, z, det.valid) * 1e3

    f_klt = jax.jit(lambda p, t, uv: klt.track(p, t, cfg, uv))
    results["klt_ms"] = time_fn(f_klt, pyr, ktmpl, det.uv) * 1e3

    f_ktmpl = jax.jit(lambda p, gx, gy, uv, m: klt.make_template(
        p, gx, gy, cfg, uv, m))
    results["klt_template_ms"] = time_fn(
        f_ktmpl, pyr, gxs, gys, det.uv, det.valid) * 1e3

    X = jnp.asarray(np.asarray(
        jax.vmap(lambda u, zz: jnp.asarray(
            [(u[0] - cam.cx) / cam.fx * zz, (u[1] - cam.cy) / cam.fy * zz,
             zz]))(det.uv, z)))
    f_ref = jax.jit(lambda T, x, uv, m: pose_refine.refine(
        cam, cfg, T, x, uv, m))
    results["pose_refine_ms"] = time_fn(
        f_ref, se3.identity(), X, det.uv, det.valid) * 1e3

    f_st = jax.jit(lambda l, r, uv: stereo_match.match(
        l, r, uv, cfg.stereo_max_disp, cfg.stereo_patch))
    results["stereo_match_ms"] = time_fn(f_st, img_l, img_r, det.uv) * 1e3

    n = cfg.max_features
    T_ck = jnp.broadcast_to(se3.exp(jnp.asarray([0.05, 0, 0, 0, 0, 0.0])),
                            (n, 3, 4))
    f_df = jax.jit(lambda t, kuv, cuv, mu, s2, a, b:
                   depth_filter.observe_and_update(
                       cam, cfg, t, kuv, cuv, mu, s2, a, b,
                       jnp.ones(n), jnp.ones(n, bool)))
    mu0 = 1.0 / jnp.maximum(z, 1e-3)
    results["depth_filter_ms"] = time_fn(
        f_df, T_ck, det.uv, det.uv, mu0, jnp.ones(n) * 1e-3,
        jnp.ones(n) * 10, jnp.ones(n) * 10) * 1e3

    st = state_mod.init_state(cfg)
    f_kf = jax.jit(lambda s: keyframe.insert(cfg, s, pyr, gxs, gys, img_r,
                                             se3.identity()))
    results["kf_insert_ms"] = time_fn(f_kf, st) * 1e3

    st_kf = f_kf(st)
    f_ba = jax.jit(lambda s: step_mod.run_window_ba(cfg, s))
    results["window_ba_ms"] = time_fn(f_ba, st_kf) * 1e3

    step = jax.jit(step_mod.make_step(cfg))
    st2, _ = step(st, img_l, img_r)
    results["full_step_ms"] = time_fn(step, st2, img_l, img_r) * 1e3

    results = {k: round(v, 3) for k, v in results.items()}
    results["backend"] = jax.devices()[0].platform
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
