#!/usr/bin/env python
"""Benchmark: frames/s/chip for the full SVO pipeline, EuRoC geometry.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, ...}

Workload: synthetic 752x480 stereo sequence (no EuRoC data in this sandbox
— SURVEY.md §0) through the full per-frame pipeline (pyramid → sparse align
→ KLT → pose refine → depth filters → KF policy → window BA) as one
``lax.scan`` on device; fps excludes rendering (frames are pre-staged in
device memory, as the reference's fps excludes dataset decode —
SURVEY.md §7.3.5).

``vs_baseline``: ratio against this same pipeline on host CPU (the
provisional denominator mandated by BASELINE.md until the reference binary
can be measured). The CPU number is cached in bench_results/cpu_baseline.json.
The north-star target is fps > 2x the *reference C++* CPU fps; our own JAX
CPU fps stands in for it (clearly labeled) while the reference mount is
empty.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "100"))
N_CPU_FRAMES = int(os.environ.get("BENCH_CPU_FRAMES", "10"))
# Accuracy gates (VERDICT r1 item 1): the judged metric is fps AT accuracy.
# A regression in either must fail the bench loudly, not ride along as a
# footnote next to a better fps number.
ATE_GATE_M = float(os.environ.get("BENCH_ATE_GATE", "0.02"))
TRACK_GATE = float(os.environ.get("BENCH_TRACK_GATE", "0.99"))
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench_results", "cpu_baseline.json")


def _run(n_frames: int, repeats: int = 2, cfg=None,
         scene_kind: str = "planes", perturb: bool = False):
    """Render a sequence and time the scan-based pipeline. Returns
    (fps, ate_rmse, n_kf, tracking_ok, (rpe_t, rpe_r))."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stereo_svo_tpu.config import SvoConfig
    from stereo_svo_tpu.engine import runner
    from stereo_svo_tpu.eval import ate
    from stereo_svo_tpu.io import synthetic

    cfg = cfg or SvoConfig()
    cam = cfg.camera

    # pre-stage frames on device (rendering excluded from timing)
    scene = synthetic.get_scene(scene_kind, 0)
    render = jax.jit(lambda T: synthetic.render_stereo(cam, T, scene))
    pert = jax.jit(synthetic.perturb_stereo)
    key = jax.random.PRNGKey(0)
    lefts, rights, gts = [], [], []
    for i in range(n_frames):
        T = synthetic.trajectory_pose(jnp.asarray(i * 0.08, jnp.float32))
        l, r = render(T)
        if perturb:
            key, sub = jax.random.split(key)
            l, r = pert(l, r, sub)
        lefts.append(l)
        rights.append(r)
        gts.append(np.asarray(T))
    lefts = jnp.stack(lefts)
    rights = jnp.stack(rights)
    jax.block_until_ready((lefts, rights))

    run = jax.jit(lambda l, r: runner.run_sequence_scan(cfg, l, r))
    state, outs = run(lefts, rights)           # compile + warmup
    jax.block_until_ready(outs.T_wc)

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, outs = run(lefts, rights)
        jax.block_until_ready((state, outs))
        dt = time.perf_counter() - t0
        # guard against async-dispatch artifacts through the remote PJRT
        # tunnel (observed once: block_until_ready returned in ~0.3 ms →
        # absurd fps); a full-pipeline frame can't be faster than ~0.1 ms
        if dt > n_frames * 1e-4:
            best = min(best, dt)
    fps = n_frames / best if best < float("inf") else float("nan")

    est_T = np.asarray(outs.T_wc)
    gt_T = np.stack(gts)
    err = ate.ate_rmse(ate.positions(est_T), ate.positions(gt_T))
    rpe_t, rpe_r = ate.rpe(est_T, gt_T)
    n_kf = int(np.asarray(outs.kf_inserted).sum())
    ok = float(np.asarray(outs.tracking_ok).mean())
    return fps, err, n_kf, ok, (rpe_t, rpe_r)


def _cpu_baseline() -> float:
    """Measure (or read cached) CPU fps for the same pipeline."""
    if os.path.exists(_CACHE):
        with open(_CACHE) as f:
            return json.load(f)["cpu_fps"]
    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                "BENCH_MODE": "cpu", "XLA_FLAGS": ""})
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1800)
        line = out.stdout.strip().splitlines()[-1]
        fps = json.loads(line)["value"]
        os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
        with open(_CACHE, "w") as f:
            json.dump({"cpu_fps": fps, "n_frames": N_CPU_FRAMES,
                       "note": "provisional denominator: our own pipeline "
                               "on host CPU (BASELINE.md action item 2)"},
                      f, indent=1)
        return fps
    except Exception:
        return float("nan")


def _run_batched(n_frames: int, batch: int = 8, repeats: int = 2):
    """Config #4: `batch` sequences vmapped on one chip; aggregate fps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stereo_svo_tpu.config import SvoConfig
    from stereo_svo_tpu.engine import runner
    from stereo_svo_tpu.io import synthetic

    cfg = SvoConfig()
    cam = cfg.camera
    lefts, rights = [], []
    for b in range(batch):
        scene = synthetic.default_scene(b)
        render = jax.jit(lambda T, s=scene: synthetic.render_stereo(cam, T, s))
        ls, rs = [], []
        for i in range(n_frames):
            T = synthetic.trajectory_pose(jnp.asarray(i * 0.08, jnp.float32))
            l, r = render(T)
            ls.append(l)
            rs.append(r)
        lefts.append(jnp.stack(ls))
        rights.append(jnp.stack(rs))
    lefts = jnp.stack(lefts)
    rights = jnp.stack(rights)
    jax.block_until_ready((lefts, rights))

    run = jax.jit(lambda l, r: runner.run_sequence_batched(cfg, l, r))
    _, outs = run(lefts, rights)
    jax.block_until_ready(outs.T_wc)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        st, outs = run(lefts, rights)
        jax.block_until_ready((st, outs))
        dt = time.perf_counter() - t0
        if dt > n_frames * 1e-4:     # see artifact guard in _run
            best = min(best, dt)
    ok = float(np.asarray(outs.tracking_ok).mean())
    fps = batch * n_frames / best if best < float("inf") else float("nan")
    return fps, ok


def main():
    scene_kind = os.environ.get("BENCH_SCENE", "planes")
    perturb = os.environ.get("BENCH_PERTURB") == "1"

    if os.environ.get("BENCH_MODE") == "cpu":
        fps, err, n_kf, ok, _ = _run(N_CPU_FRAMES, repeats=1)
        print(json.dumps({"metric": "frames_per_s_cpu", "value": fps,
                          "unit": "frames/s", "vs_baseline": 1.0}))
        return

    if os.environ.get("BENCH_STRESS") == "1":
        # North-star config #3: 5-level pyramids, 2048 seeds, 752x480
        # (config.stress_config) through the same scan runner.
        from stereo_svo_tpu.config import stress_config
        fps, err, n_kf, ok, rp = _run(N_FRAMES, cfg=stress_config(),
                                      scene_kind=scene_kind, perturb=perturb)
        print(json.dumps({
            "metric": "frames_per_s_per_chip_stress_2048seeds_5lvl_752x480",
            "value": round(fps, 2), "unit": "frames/s",
            "vs_baseline": None, "ate_rmse_m": round(err, 4),
            "rpe_t_m": round(rp[0], 5), "rpe_r_rad": round(rp[1], 5),
            "tracking_ok_frac": round(ok, 4), "keyframes": n_kf,
            "n_frames": N_FRAMES}))
        return

    if os.environ.get("BENCH_GEOM") == "kitti":
        # KITTI-geometry variant (1241x376, wide baseline): validates the
        # pipeline on the second real-dataset geometry while the sandbox
        # has no KITTI data (VERDICT r1 missing #1).
        from stereo_svo_tpu.config import kitti_config
        fps, err, n_kf, ok, rp = _run(N_FRAMES, cfg=kitti_config(),
                                      scene_kind=scene_kind, perturb=perturb)
        print(json.dumps({
            "metric": "frames_per_s_per_chip_kitti_geom_1241x376",
            "value": round(fps, 2), "unit": "frames/s",
            "vs_baseline": None, "ate_rmse_m": round(err, 4),
            "rpe_t_m": round(rp[0], 5), "rpe_r_rad": round(rp[1], 5),
            "tracking_ok_frac": round(ok, 4), "keyframes": n_kf,
            "scene": scene_kind, "perturb": perturb,
            "n_frames": N_FRAMES}))
        return

    fps, err, n_kf, ok, rp = _run(N_FRAMES, scene_kind=scene_kind,
                                  perturb=perturb)
    fps_b, ok_b = (None, True)
    if os.environ.get("BENCH_SKIP_BATCHED") != "1":
        fps_b, ok_b = _run_batched(max(N_FRAMES // 4, 10))
    cpu_fps = _cpu_baseline()
    vs = fps / cpu_fps if cpu_fps == cpu_fps and cpu_fps > 0 else None
    ok_all = min(ok, ok_b if fps_b else 1.0)
    gate_fail = []
    if err > ATE_GATE_M:
        gate_fail.append(f"ate_rmse {err:.4f} > {ATE_GATE_M}")
    if ok_all < TRACK_GATE:
        gate_fail.append(f"tracking_ok {ok_all:.4f} < {TRACK_GATE}")
    print(json.dumps({
        "metric": "frames_per_s_per_chip_synthetic_euroc_752x480",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "batched8_frames_per_s": round(fps_b, 2) if fps_b else None,
        "ate_rmse_m": round(err, 4),
        "rpe_t_m": round(rp[0], 5), "rpe_r_rad": round(rp[1], 5),
        "tracking_ok_frac": round(ok_all, 4),
        "keyframes": n_kf,
        "n_frames": N_FRAMES,
        "scene": scene_kind, "perturb": perturb,
        "accuracy_gate": ("FAIL: " + "; ".join(gate_fail)) if gate_fail
                         else "pass",
        "baseline_note": "vs_baseline = ratio to this same pipeline on host "
                         "CPU (provisional per BASELINE.md; reference mount "
                         "empty)",
    }))
    if gate_fail:
        print("ACCURACY GATE FAILED: " + "; ".join(gate_fail),
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
