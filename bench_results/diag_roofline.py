#!/usr/bin/env python
"""Roofline / speed-of-light accounting for the top per-frame ops
(VERDICT r3 next #1b: no op had ever been compared to a hardware floor).

Three floors are computed per op:
  * FLOP floor: analytic MAC count of the op's einsums at production
    shapes / MXU bf16 peak (TPU v5e ≈ 197 TFLOP/s; default matmul
    precision feeds bf16 into the MXU — measured r3, the explicit bf16
    cast was a no-op);
  * HBM floor: bytes that must cross HBM (image reads per pass; the
    small per-feature tensors live in VMEM) / ≈ 819 GB/s;
  * serial floor: the ops are iterative GN/LK loops — `steps` dependent
    {sample → reduce → solve → update} stages that cannot overlap. The
    per-stage latency is MEASURED here with a dependent-chain microbench
    (6x6 solve + exp + compose, the exact chain align/KLT carry), so the
    serial floor = steps × measured stage latency.

The point: at these shapes every per-frame op is SERIAL-CHAIN-bound, two
orders of magnitude above its FLOP floor — the speed-of-light statement
for this algorithm class is dependency-chain latency, not bandwidth.
"""
import os
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.getcwd())
import jax
import jax.numpy as jnp
import numpy as np

from stereo_svo_tpu.config import SvoConfig
from stereo_svo_tpu.geometry import se3
from stereo_svo_tpu.ops import solve

PEAK_BF16 = 197e12          # TPU v5e MXU, FLOP/s
PEAK_HBM = 819e9            # TPU v5e HBM, B/s

cfg = SvoConfig()
cam = cfg.camera
N, P = cfg.max_features, cfg.align_patch
H, W = cam.height, cam.width


def level_hw(lv):
    return (H >> lv), (W >> lv)


def sample_flops(lv, n=N, p=P):
    """Tent-kernel sampling einsums at level lv (ops/interp_mxu.py):
    (n·p, H_l)@(H_l, W_l) row combination + (n·p·p, W_l) column
    contraction."""
    h, w = level_hw(lv)
    return 2 * n * p * h * w + 2 * n * p * p * w


def gn_reduce_flops(n=N, p2=P * P):
    """H = J^T W J and b = J^T W e einsums: (n·p2) x 6 x 6 + (n·p2) x 6."""
    return 2 * n * p2 * 36 + 2 * n * p2 * 6


# --- measured serial-stage latency: the dependent chain each GN/LK
# iteration carries (solve -> exp -> compose), unhideable latency ---
R = 400


def chain(c0):
    def body(c, _):
        Hm = jnp.eye(6) * (3.0 + 1e-6 * c)
        rhs = jnp.concatenate([jnp.eye(6), jnp.ones((1, 6)) * 1e-3])
        sol = solve.chol_solve_small(jnp.broadcast_to(Hm, (7, 6, 6)), rhs)
        T = se3.exp(sol[6] * 1e-3)
        return c + T[0, 3] + 1e-6, None
    return jax.lax.scan(body, c0, None, length=R)[0]


def timed(fn, *a):
    for _ in range(2):
        np.asarray(fn(*a))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    f = jax.jit(chain)
    triv = jax.jit(lambda x: x + 1.0)
    disp = timed(triv, jnp.zeros(()))
    stage_us = (timed(f, jnp.zeros(())) - disp) / R * 1e3
    print(f"measured solve+exp+compose stage latency: {stage_us:.2f} us "
          f"(dependent chain of {R})")

    # align: schedule (2,3,4,8) coarse->fine over levels 3..0; each
    # iteration = sample + (chunk-refresh) reduce + solve-chain stage
    sched = list(cfg.align_iters_per_level)      # coarse->fine
    lvls = list(range(cfg.align_levels - 1, cfg.align_min_level - 1, -1))
    fl = sum(n_it * (sample_flops(lv) + gn_reduce_flops())
             for n_it, lv in zip(sched, lvls))
    steps = sum(sched)
    img_bytes = sum(n_it * 4 * level_hw(lv)[0] * level_hw(lv)[1]
                    for n_it, lv in zip(sched, lvls))
    rows = [("align", fl, img_bytes, steps, 0.297)]

    # KLT: klt_levels levels x klt_max_iters; patch 8 -> per-feature
    # (N, 64) sampling at each level's resolution
    fl = sum(cfg.klt_max_iters
             * (sample_flops(lv, p=cfg.klt_patch) + 2 * N * 64 * 2)
             for lv in range(cfg.klt_levels))
    steps = cfg.klt_levels * cfg.klt_max_iters
    img_bytes = sum(cfg.klt_max_iters * 4 * level_hw(lv)[0] * level_hw(lv)[1]
                    for lv in range(cfg.klt_levels))
    rows.append(("klt", fl, img_bytes, steps, 0.123))

    # pose refine: refine_max_iters GN steps on (N,2) reprojection
    # residuals — negligible FLOPs, pure chain
    rows.append(("pose_refine", cfg.refine_max_iters * 2 * N * 2 * 36,
                 0, cfg.refine_max_iters, 0.110))

    # window BA (KF-rate): 5 GN iters x ~50 small einsums + one 60x60
    # Cholesky; FLOPs ~ K*N*3 blocks
    K = cfg.max_keyframes
    fl_iter = (2 * K * N * 3 * (36 + 9 + 18 + 6 + 3) * 3   # HIGHEST = 3 passes
               + 2 * K * K * N * 108 + 60 ** 3 // 3)
    rows.append(("window_ba", cfg.ba_iters * fl_iter, 0,
                 cfg.ba_iters, 0.891))

    print(f"{'op':12s} {'GFLOP':>7s} {'flop_floor_us':>13s} "
          f"{'hbm_floor_us':>12s} {'serial_floor_us':>15s} "
          f"{'measured_us':>11s} {'binding':>8s}")
    for name, fl, by, steps, meas_ms in rows:
        ff = fl / PEAK_BF16 * 1e6
        hf = by / PEAK_HBM * 1e6
        sf = steps * stage_us
        meas = meas_ms * 1e3
        floors = {"flop": ff, "hbm": hf, "serial": sf}
        binding = max(floors, key=floors.get)
        print(f"{name:12s} {fl/1e9:7.2f} {ff:13.1f} {hf:12.1f} "
              f"{sf:15.1f} {meas:11.1f} {binding:>8s}")


if __name__ == "__main__":
    main()
