#!/usr/bin/env python
"""Amortized per-op timings: each op repeated R times inside one jitted
lax.scan, so the axon tunnel's per-dispatch latency (~26ms) divides out.
This is the number that matters for the scan-based pipeline."""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from stereo_svo_tpu.config import SvoConfig
from stereo_svo_tpu.frontend import detector, pose_refine
from stereo_svo_tpu.geometry import camera as cam_mod, se3
from stereo_svo_tpu.io import synthetic
from stereo_svo_tpu.ops import align, depth_filter, klt, pyramid, stereo_match
from stereo_svo_tpu.utils.profiling import time_fn

# R must be large enough that the tunnel's dispatch jitter (several ms)
# divides below the op cost being measured: at R=20 the per-op error is
# ±0.5 ms — useless at sub-ms scale (measured: a 0.6 µs op reported as
# 0.58 ms). 200 brings it to ±50 µs.
R = int(os.environ.get("BENCH_AMORT_R", "200"))
DISPATCH_MS = None  # measured below


def scanned(body_of_c):
    """Wrap op in a scan of R dependent iterations; returns jitted fn."""
    def outer(*args):
        def body(c, _):
            out = body_of_c(c, *args)
            return c + 1e-3, out
        return jax.lax.scan(body, 0.0, None, length=R)
    return jax.jit(outer)


def main():
    global DISPATCH_MS
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
    X = cam_mod.backproject(cam, det.uv, z)

    f_triv = jax.jit(lambda x: x + 1.0)
    DISPATCH_MS = time_fn(f_triv, jnp.ones((8, 128))) * 1e3

    results = {"dispatch_ms": DISPATCH_MS}

    def amort(name, fn, *args):
        ms = time_fn(fn, *args) * 1e3
        results[name] = (ms - DISPATCH_MS) / R

    twist = jnp.zeros(6).at[0].set(1e-4)
    amort("align_ms", scanned(
        lambda c, p, t: align.align(p, t, cam, cfg,
                                    se3.exp(twist * c))[0]), pyr, tmpl)
    amort("klt_ms", scanned(
        lambda c, p, t, uv: klt.track(p, t, cfg, uv + c)[0]),
        pyr, ktmpl, det.uv)
    amort("pyramid_ms", scanned(
        lambda c, i: pyramid.build_with_gradients(i + c, cfg.num_levels)[0][0]),
        img_l)
    amort("align_template_ms", scanned(
        lambda c, p, gx, gy, uv, zz, m: align.make_template(
            p, gx, gy, cam, cfg, uv + c, zz, m).patches),
        pyr, gxs, gys, det.uv, z, det.valid)
    amort("klt_template_ms", scanned(
        lambda c, p, gx, gy, uv, m: klt.make_template(
            p, gx, gy, cfg, uv + c, m).patches),
        pyr, gxs, gys, det.uv, det.valid)
    amort("stereo_match_ms", scanned(
        lambda c, l, r, uv: stereo_match.match(
            l, r, uv + c, cfg.stereo_max_disp, cfg.stereo_patch)[0]),
        img_l, img_r, det.uv)
    amort("pose_refine_ms", scanned(
        lambda c, x, uv, m: pose_refine.refine(
            cam, cfg, se3.exp(twist * c), x, uv, m)[0]),
        X, det.uv, det.valid)
    amort("detector_ms", scanned(
        lambda c, p, gx, gy: detector.detect(
            [l + c for l in p], gx, gy, cfg).uv), pyr, gxs[0], gys[0])

    n = cfg.max_features
    T_ck = jnp.broadcast_to(se3.exp(jnp.asarray([0.05, 0, 0, 0, 0, 0.0])),
                            (n, 3, 4))
    mu0 = 1.0 / jnp.maximum(z, 1e-3)
    amort("depth_filter_ms", scanned(
        lambda c, t, kuv, cuv, mu: depth_filter.observe_and_update(
            cam, cfg, t, kuv, cuv, mu + c * 0, jnp.ones(n) * 1e-3,
            jnp.ones(n) * 10, jnp.ones(n) * 10, jnp.ones(n),
            jnp.ones(n, bool)).mu), T_ck, det.uv, det.uv, mu0)

    # --- Pallas-vs-einsum race at production shapes (VERDICT r2 #7) ---
    # The two implementations of the alignment hot loop: tent-kernel MXU
    # einsums (ops/interp_mxu.py, production) vs the fused Pallas kernel
    # (ops/pallas/align_kernel.py). Same math, parity-tested; the race
    # here decides the dispatch (see ROADMAP).
    if jax.default_backend() == "tpu":
        from stereo_svo_tpu.ops import interp
        from stereo_svo_tpu.ops.pallas import align_kernel

        P = cfg.align_patch
        tmpl0 = tmpl.patches[-1]              # finest level (N, P²)
        J0 = tmpl.jac[-1]                     # (N, P², 6)
        w0 = tmpl.mask.astype(jnp.float32)
        amort("race_sample_mxu_ms", scanned(
            lambda c, i, u: interp.sample_patch(i, u + c, P, method="mxu")),
            img_l, det.uv)
        amort("race_sample_pallas_ms", scanned(
            lambda c, i, u: align_kernel.sample_patches(i, u + c, P)),
            img_l, det.uv)

        def gn_einsum(c, i, u, t0, J, w):
            cur = interp.sample_patch(i, u + c, P, method="mxu")
            e = cur - t0
            ww = w[:, None] * jnp.where(
                jnp.abs(e) <= cfg.align_huber, 1.0,
                cfg.align_huber / jnp.maximum(jnp.abs(e), 1e-6))
            H = jnp.einsum("npi,np,npj->ij", J, ww, J,
                           preferred_element_type=jnp.float32)
            b = jnp.einsum("npi,np,np->i", J, ww, e,
                           preferred_element_type=jnp.float32)
            return H, b

        amort("race_gn_einsum_ms", scanned(gn_einsum),
              img_l, det.uv, tmpl0, J0, w0)
        amort("race_gn_pallas_ms", scanned(
            lambda c, i, u, t0, J, w: align_kernel.gn_accumulate(
                i, u + c, t0, J, w, P, cfg.align_huber)[0]),
            img_l, det.uv, tmpl0, J0, w0)

    print(json.dumps({k: round(v, 3) for k, v in results.items()},
                     indent=1))


if __name__ == "__main__":
    main()
