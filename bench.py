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

Accuracy gates (VERDICT r1 #1, r2 #1): the judged metric is fps AT
accuracy. EVERY bench path — default, batched, stress, KITTI-geometry —
checks ATE and tracking against its gate and exits 1 on failure; a
regression can never ride along as a footnote next to a better fps number.

Env knobs:
  BENCH_FRAMES       frames per sequence (default 100)
  BENCH_STRESS=1     north-star config #3 (5-level pyramid, 2048 seeds)
  BENCH_GEOM=kitti   KITTI geometry (1241x376, 0.537 m baseline)
  BENCH_SCENE=...    synthetic scene kind (planes|clutter|road)
  BENCH_TRAJ=...     trajectory kind (arc|kitti|spin|loop)
  BENCH_PERTURB=1    photometric nuisance model
  BENCH_KF_EVERY=N   keyframe cadence quantization for the batched run
  BENCH_LATENCY=1    per-frame latency percentiles (python-loop run)
  BENCH_SKIP_BATCHED=1  skip the batched-8 run
  BENCH_ONLINE_LOOP=N   enable online loop closure (online_loop_every=N)
                     on the default path — overhead/ATE measurement for
                     loop workloads (pair with BENCH_TRAJ=loop)
  BENCH_ATE_GATE / BENCH_TRACK_GATE  override the accuracy gates
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "100"))
N_CPU_FRAMES = int(os.environ.get("BENCH_CPU_FRAMES", "10"))
N_VALID = int(os.environ.get("BENCH_VALID_RUNS", "5"))
ATE_GATE_M = float(os.environ.get("BENCH_ATE_GATE", "0.02"))
TRACK_GATE = float(os.environ.get("BENCH_TRACK_GATE", "0.99"))
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench_results", "cpu_baseline.json")


def _check_gates(err, ok, ate_gate=None, track_gate=None):
    """Collect gate violations; every bench path runs through this."""
    ate_gate = ATE_GATE_M if ate_gate is None else ate_gate
    track_gate = TRACK_GATE if track_gate is None else track_gate
    fails = []
    if err is not None and err > ate_gate:
        fails.append(f"ate_rmse {err:.4f} > {ate_gate}")
    if ok is not None and ok < track_gate:
        fails.append(f"tracking_ok {ok:.4f} < {track_gate}")
    return fails


def _emit(payload, gate_fail):
    payload["accuracy_gate"] = (
        "FAIL: " + "; ".join(gate_fail)) if gate_fail else "pass"
    print(json.dumps(payload))
    if gate_fail:
        print("ACCURACY GATE FAILED: " + "; ".join(gate_fail),
              file=sys.stderr)
        sys.exit(1)


def _render_sequence(cam, n_frames, scene_kind="planes", traj_kind="arc",
                     perturb=False, seed=0, dt=0.08):
    """Pre-stage a rendered sequence on device; returns (lefts, rights, gts).

    Rendered frames are cached under bench_results/ (gitignored): the
    ray-cast through the remote PJRT tunnel costs minutes per 100-frame
    sequence and is identical across runs — the cache is invalidated when
    io/synthetic.py changes.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stereo_svo_tpu.io import synthetic

    # driving-scale scenes render with 2x2 supersampling: point-sampled
    # world-scale texture aliases into frame-incoherent noise at long
    # range (see io/synthetic.render_view) — measured to collapse the
    # 700-frame road_long run (drift 4x at equal frame counts, tracking
    # lost at frame 283)
    aa = 2 if scene_kind.startswith("road") else 1
    cdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_results")

    def cache_name(n):
        return os.path.join(
            cdir, f"seq_{scene_kind}_{traj_kind}_{cam.width}x{cam.height}"
                  f"_{n}f_p{int(perturb)}_s{seed}_dt{dt}"
                  + (f"_aa{aa}" if aa > 1 else "") + ".npz")

    cache = cache_name(n_frames)
    src_mtime = os.path.getmtime(synthetic.__file__)
    # a LONGER cached sequence of the same params serves any prefix (the
    # trajectory is time-parameterized, frame i is identical) — slicing
    # beats re-rendering AND re-transferring (a 700-frame KITTI-res
    # sequence is ~1.3 GB through the tunnel)
    import glob as glob_mod
    pat = cache_name("*")
    cands = []
    for p in glob_mod.glob(pat):
        try:
            n = int(p[len(pat.split("*")[0]):].split("f_")[0])
        except ValueError:
            continue
        if n >= n_frames and os.path.getmtime(p) > src_mtime:
            cands.append((n, p))
    if cands:
        _, best = min(cands)
        d = np.load(best)
        return (jnp.asarray(d["l"][:n_frames]).astype(jnp.float32),
                jnp.asarray(d["r"][:n_frames]).astype(jnp.float32),
                d["g"][:n_frames])

    scene = synthetic.get_scene(scene_kind, seed)
    render = jax.jit(
        lambda T: synthetic.render_stereo(cam, T, scene, aa=aa))
    pert = jax.jit(synthetic.perturb_stereo)
    key = jax.random.PRNGKey(seed)
    lefts, rights, gts = [], [], []
    for i in range(n_frames):
        T = synthetic.trajectory_pose(jnp.asarray(i * dt, jnp.float32),
                                      kind=traj_kind)
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
    gts = np.stack(gts)
    try:
        os.makedirs(cdir, exist_ok=True)
        # float16 on disk: renders are 0-255 intensities (integers exact
        # in f16, fractional parts within ~0.06 — far below sensor
        # noise); halves disk + reload-transfer cost
        np.savez(cache, l=np.asarray(lefts, np.float16),
                 r=np.asarray(rights, np.float16), g=gts)
    except OSError:
        pass
    return lefts, rights, gts


def _dispatch_roundtrip_ms() -> float:
    """Median dispatch+fetch round trip for a trivial jitted op.

    Lower bound on the fixed per-RUN overhead the remote-PJRT tunnel
    charges a scan run; used as the physical-plausibility scale for the
    slope fit's intercept (VERDICT r4 weak #1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    np.asarray(f(x))                      # compile
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def _timed_median(run, l, r, n, n_valid):
    """Median wall time of `run(l, r)` (n frames) + samples + discards.

    Pinned timing procedure (VERDICT r3 next #9): collect n_valid valid
    runs, take the MEDIAN (not best — "chip got faster" must not be
    confusable with "host got quieter") and count the runs the
    timing-artifact guard discards. `run` must be a shared jitted callable
    so retries reuse the compile."""
    import jax
    import numpy as np

    state, outs = run(l, r)           # compile + warmup
    np.asarray(outs.tracking_ok)
    jax.block_until_ready(state)
    times, n_disc = [], 0
    for _ in range(n_valid * 3):
        t0 = time.perf_counter()
        state, outs = run(l, r)
        # Through the remote PJRT tunnel block_until_ready can return
        # before the computation actually finishes (observed r1
        # occasionally, chronic by r3). A device→host fetch of a tiny
        # output is the only reliable completion barrier.
        np.asarray(outs.tracking_ok)
        jax.block_until_ready((state, outs))
        dt = time.perf_counter() - t0
        if dt > n * 1e-4:
            times.append(dt)
            if len(times) >= n_valid:
                break
        else:
            n_disc += 1
    med = float(np.median(times)) if times else float("nan")
    return med, times, n_disc, outs


def _timed_chained(run, l, r, k=5):
    """Wall time per run with k runs queued behind ONE completion barrier.

    The fixed per-run tunnel overhead (dispatch + completion fetch) is
    amortized /k, so this SLIGHTLY overestimates per-run cost (honest
    direction for a fps headline) without differencing two noisy numbers.
    Fallback when the slope fit fails its sanity gate (VERDICT r4 #1a)."""
    import jax
    import numpy as np

    state, outs = run(l, r)
    np.asarray(outs.tracking_ok)
    jax.block_until_ready(state)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            state, outs = run(l, r)
        np.asarray(outs.tracking_ok)
        jax.block_until_ready((state, outs))
        samples.append((time.perf_counter() - t0) / k)
    return float(np.median(samples))


def _slope_fit(run, l, r, n_frames, n_valid, dispatch_ms,
               first=None):
    """Sanity-gated slope timing → (fps, timing_fields).

    The two-point slope (t(n) − t(n/2)) / (n/2) removes the fixed ~60 ms
    per-RUN remote-PJRT overhead — but differencing two noisy medians can
    amplify host-load noise into garbage (the r4 judged artifact published
    34 fps with a physically impossible −1339 ms intercept). The fit now
    defends itself (VERDICT r4 next #1a): the intercept must land in
    [−2 ms, max(150 ms, 6× measured dispatch)] and the spread must be
    ≤ 30%; one retry with 2× samples, then an honest fallback — chained-k
    runs behind one completion barrier (overhead amortized /k, slight
    UNDERestimate of fps) — with `timing_fallback` naming the path taken.
    """
    import numpy as np

    n_half = n_frames // 2
    hi_ms = max(150.0, 6.0 * dispatch_ms)

    def attempt(n_valid):
        if first is not None and n_valid == first[2]:
            t_full, times, disc = first[0], first[1], 0
        else:
            t_full, times, disc, _ = _timed_median(
                run, l, r, n_frames, n_valid)
        t_half, _, disc_h, _ = _timed_median(
            run, l[:n_half], r[:n_half], n_half, n_valid)
        slope_s = (t_full - t_half) / (n_frames - n_half)
        intercept_ms = (t_full - slope_s * n_frames) * 1e3
        spread = (100.0 * (max(times) - min(times)) / t_full
                  if times else float("nan"))
        ok = (slope_s > 0 and -2.0 <= intercept_ms <= hi_ms
              and spread == spread and spread <= 30.0)
        return ok, slope_s, intercept_ms, spread, t_full, times, disc + disc_h

    ok, slope_s, intercept_ms, spread, t_full, times, n_disc = attempt(
        n_valid)
    retried = False
    if not ok:
        retried = True
        ok, slope_s, intercept_ms, spread, t_full, times, d2 = attempt(
            2 * n_valid)
        n_disc += d2
    fallback = None
    if ok:
        fps = 1.0 / slope_s
    else:
        t_chain = _timed_chained(run, l, r)
        fps = n_frames / t_chain
        fallback = (f"chained_k5 ({t_chain * 1e3:.0f} ms/run, per-run "
                    "overhead amortized /5) — slope fit failed sanity gate"
                    + (" after retry" if retried else ""))
    fields = {
        "n_timing_runs": len(times), "n_discarded": n_disc,
        "timing_spread_pct": round(spread, 1),
        "fps_raw_single_run": round(n_frames / t_full, 2),
        "per_run_overhead_ms": round(intercept_ms, 1),
        "dispatch_roundtrip_ms": round(dispatch_ms, 1),
        "timing_fallback": fallback,
        "timing_method": f"slope over n={n_half},{n_frames}, "
                         f"intercept gated to [-2, {hi_ms:.0f}] ms & "
                         "spread <= 30% (see BASELINE.md r5)",
    }
    return fps, t_full, fields


def _run(n_frames: int, repeats: int | None = None, cfg=None,
         scene_kind: str = "planes", perturb: bool = False,
         traj_kind: str = "arc"):
    """Render a sequence and time the scan-based pipeline. Returns
    (fps, ate_rmse, n_kf, tracking_ok, (rpe_t, rpe_r), timing_dict).
    ``repeats`` = valid timing runs to take the median over (default
    BENCH_VALID_RUNS)."""
    import jax
    import numpy as np

    from stereo_svo_tpu.config import SvoConfig
    from stereo_svo_tpu.engine import runner
    from stereo_svo_tpu.eval import ate

    cfg = cfg or SvoConfig()
    lefts, rights, gt_T = _render_sequence(
        cfg.camera, n_frames, scene_kind, traj_kind, perturb)

    n_valid = repeats or N_VALID
    run = jax.jit(lambda a, b: runner.run_sequence_scan(cfg, a, b))
    t_full0, times0, n_disc0, outs = _timed_median(
        run, lefts, rights, n_frames, n_valid)
    dispatch_ms = _dispatch_roundtrip_ms()
    fps, t_full, timing = _slope_fit(
        run, lefts, rights, n_frames, n_valid, dispatch_ms,
        first=(t_full0, times0, n_valid))
    timing["n_discarded"] += n_disc0

    est_T = np.asarray(outs.T_wc)
    err = ate.ate_rmse(ate.positions(est_T), ate.positions(gt_T))
    rpe_t, rpe_r = ate.rpe(est_T, gt_T)
    n_kf = int(np.asarray(outs.kf_inserted).sum())
    ok = float(np.asarray(outs.tracking_ok).mean())
    timing["gt_travel_m"] = round(float(np.sum(np.linalg.norm(
        np.diff(ate.positions(gt_T), axis=0), axis=-1))), 2)
    return fps, err, n_kf, ok, (rpe_t, rpe_r), timing


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
            env=env, capture_output=True, text=True, timeout=3600)
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


def _run_batched(n_frames: int, batch: int = 8,
                 kf_every: int = 1):
    """Config #4: `batch` sequences vmapped on one chip; aggregate fps.

    Each sequence renders a different scene (seed b) over the SAME
    ground-truth trajectory, so per-sequence ATE is measurable (VERDICT r2
    missing #2: the batched path previously computed no ATE at all).
    Returns (fps, tracking_ok, ate_max, ate_mean).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stereo_svo_tpu.config import SvoConfig
    from stereo_svo_tpu.engine import runner
    from stereo_svo_tpu.eval import ate

    cfg = SvoConfig(kf_every=kf_every) if kf_every > 1 else SvoConfig()
    cam = cfg.camera
    # per-sequence renders go through _render_sequence so they hit the
    # same on-disk cache as the single-sequence path (VERDICT r4 weak #2:
    # the batched path re-rendered 8x25 frames through the tunnel on every
    # default bench invocation)
    lefts, rights = [], []
    gts = None
    for b in range(batch):
        l, r, gts = _render_sequence(cam, n_frames, "planes", "arc",
                                     seed=b)
        lefts.append(l)
        rights.append(r)
    lefts = jnp.stack(lefts)
    rights = jnp.stack(rights)
    jax.block_until_ready((lefts, rights))

    run = jax.jit(lambda a, b: runner.run_sequence_batched(cfg, a, b))
    t_full, times, n_disc, outs = _timed_median(
        run, lefts, rights, n_frames, N_VALID)
    n_half = n_frames // 2
    t_half, _, disc_h, _ = _timed_median(
        run, lefts[:, :n_half], rights[:, :n_half], n_half, N_VALID)
    ok = float(np.asarray(outs.tracking_ok).mean())
    # slope fit, see _slope_fit: per-run tunnel overhead excluded; the
    # denominator is guarded (ADVICE r4: timing noise with
    # t_half >= t_full must not publish a negative/infinite headline)
    if t_full > t_half:
        fps = batch * (n_frames - n_half) / (t_full - t_half)
    else:
        t_chain = _timed_chained(run, lefts, rights)
        fps = batch * n_frames / t_chain
    est = np.asarray(outs.T_wc)                       # (B, T, 3, 4)
    errs = [ate.ate_rmse(ate.positions(est[b]), ate.positions(gts))
            for b in range(batch)]
    return (fps, ok, float(np.max(errs)), float(np.mean(errs)),
            n_disc + disc_h)


def _run_latency(n_frames: int, cfg=None):
    """Per-frame latency distribution through the python-loop runner.

    The scan runner amortizes dispatch and hides per-frame variance; this
    path times each make_jitted_step call with block_until_ready — the
    number a live-camera deployment would see (VERDICT r2 #6: measure the
    KF-frame latency spike before deciding whether PP/overlap is worth
    building). NOTE: through the remote axon tunnel this includes ~ms-level
    host→device dispatch overhead per call; the p99/p50 RATIO and the
    KF-vs-non-KF split are the meaningful signals, not absolute values.
    """
    import jax
    import numpy as np

    from stereo_svo_tpu.config import SvoConfig
    from stereo_svo_tpu.engine import runner

    cfg = cfg or SvoConfig()
    lefts, rights, _ = _render_sequence(cfg.camera, n_frames)
    svo = runner.StereoSvo(cfg)
    svo.new_image(lefts[0], rights[0])       # compile
    lat, kf = [], []
    for i in range(1, n_frames):
        t0 = time.perf_counter()
        out = svo.new_image(lefts[i], rights[i])
        jax.block_until_ready(out.T_wc)
        lat.append(time.perf_counter() - t0)
        kf.append(bool(np.asarray(out.kf_inserted)))
    lat = np.asarray(lat) * 1e3
    kf = np.asarray(kf)
    # Tail forensics (VERDICT r3 next #9: count and explain the p99
    # spike): which frames spiked >3x the median, and are they KF frames?
    # A recompile would pin the spike to a deterministic frame at ~seconds
    # scale; a tunnel hiccup lands on arbitrary frames at ~100s of ms.
    p50 = float(np.percentile(lat, 50))
    spikes = np.where(lat > 3.0 * p50)[0]
    stats = {
        "latency_p50_ms": round(p50, 3),
        "latency_p95_ms": round(float(np.percentile(lat, 95)), 3),
        "latency_p99_ms": round(float(np.percentile(lat, 99)), 3),
        "latency_kf_mean_ms": round(float(lat[kf].mean()), 3)
        if kf.any() else None,
        "latency_nonkf_mean_ms": round(float(lat[~kf].mean()), 3),
        "n_kf_frames": int(kf.sum()),
        "latency_spike_frames": [int(i) + 1 for i in spikes[:8]],
        "latency_spike_ms": [round(float(lat[i]), 1) for i in spikes[:8]],
        "latency_spikes_on_kf": int(kf[spikes].sum()) if spikes.size else 0,
    }
    return stats


def main():
    scene_kind = os.environ.get("BENCH_SCENE", "planes")
    traj_kind = os.environ.get("BENCH_TRAJ", "arc")
    perturb = os.environ.get("BENCH_PERTURB") == "1"

    if os.environ.get("BENCH_MODE") == "cpu":
        fps, err, n_kf, ok, _, _ = _run(N_CPU_FRAMES)
        print(json.dumps({"metric": "frames_per_s_cpu", "value": fps,
                          "unit": "frames/s", "vs_baseline": 1.0}))
        return

    if os.environ.get("BENCH_STRESS") == "1":
        # North-star config #3: 5-level pyramids, 2048 seeds, 752x480
        # (config.stress_config) through the same scan runner.
        from stereo_svo_tpu.config import stress_config
        fps, err, n_kf, ok, rp, tim = _run(N_FRAMES, cfg=stress_config(),
                                           scene_kind=scene_kind,
                                           perturb=perturb,
                                           traj_kind=traj_kind)
        payload = {
            "metric": "frames_per_s_per_chip_stress_2048seeds_5lvl_752x480",
            "value": round(fps, 2), "unit": "frames/s",
            "vs_baseline": None, "ate_rmse_m": round(err, 4),
            "rpe_t_m": round(rp[0], 5), "rpe_r_rad": round(rp[1], 5),
            "tracking_ok_frac": round(ok, 4), "keyframes": n_kf,
            "n_frames": N_FRAMES}
        payload.update(tim)
        _emit(payload, _check_gates(err, ok))
        return

    if os.environ.get("BENCH_GEOM") == "kitti":
        # KITTI-geometry variant (1241x376, wide baseline): validates the
        # pipeline on the second real-dataset geometry while the sandbox
        # has no KITTI data (VERDICT r1 missing #1). Default trajectory is
        # the forward-dominant 'kitti' kind over the deep 'road' scene —
        # the motion/geometry class the EuRoC arc never exercises.
        from stereo_svo_tpu.config import kitti_config
        # long runs (BENCH_FRAMES >= 300) drive past the default scene's
        # 60 m backdrop — use the 180 m corridor variant
        scene_k = os.environ.get(
            "BENCH_SCENE", "road" if N_FRAMES < 300 else "road_long")
        traj_k = os.environ.get("BENCH_TRAJ", "kitti")
        fps, err, n_kf, ok, rp, tim = _run(N_FRAMES, cfg=kitti_config(),
                                           scene_kind=scene_k,
                                           perturb=perturb,
                                           traj_kind=traj_k)
        # per-path ATE bound: 1.5% of actual GT travel — the upper end of
        # published stereo-VO drift on KITTI (BASELINE.md r3 analysis),
        # with a 0.25 m floor for short runs where 1.5% would dip under
        # EuRoC-scale noise. The EuRoC 0.02 m bound is not meaningful at
        # driving scale.
        travel = tim["gt_travel_m"]
        kitti_gate = float(os.environ.get("BENCH_ATE_GATE",
                                          max(0.25, 0.015 * travel)))
        payload = {
            "metric": "frames_per_s_per_chip_kitti_geom_1241x376",
            "value": round(fps, 2), "unit": "frames/s",
            "vs_baseline": None, "ate_rmse_m": round(err, 4),
            "ate_gate_m": round(kitti_gate, 3),
            "ate_pct_of_travel": round(100.0 * err / travel, 3),
            "rpe_t_m": round(rp[0], 5), "rpe_r_rad": round(rp[1], 5),
            "tracking_ok_frac": round(ok, 4), "keyframes": n_kf,
            "scene": scene_k, "traj": traj_k, "perturb": perturb,
            "n_frames": N_FRAMES}
        payload.update(tim)
        _emit(payload, _check_gates(err, ok, ate_gate=kitti_gate))
        return

    cfg0 = None
    online_every = int(os.environ.get("BENCH_ONLINE_LOOP", "0"))
    if online_every > 0:
        from stereo_svo_tpu.config import SvoConfig as _Cfg
        cfg0 = _Cfg(online_loop_every=online_every)
    fps, err, n_kf, ok, rp, tim = _run(N_FRAMES, cfg=cfg0,
                                       scene_kind=scene_kind,
                                       perturb=perturb, traj_kind=traj_kind)
    gate_fail = _check_gates(err, ok)
    fps_b = ate_b_max = ate_b_mean = None
    if os.environ.get("BENCH_SKIP_BATCHED") != "1":
        kf_every = int(os.environ.get("BENCH_KF_EVERY", "1"))
        fps_b, ok_b, ate_b_max, ate_b_mean, disc_b = _run_batched(
            max(N_FRAMES // 4, 10), kf_every=kf_every)
        tim["n_discarded"] += disc_b
        # batched gate: shorter sequence → same ATE bound applies (the
        # batched path must be AS accurate as single-sequence, VERDICT r2
        # missing #2)
        gate_fail += ["batched " + g for g in _check_gates(ate_b_max, ok_b)]
    lat_stats = {}
    if os.environ.get("BENCH_LATENCY") == "1":
        lat_stats = _run_latency(N_FRAMES)
    cpu_fps = _cpu_baseline()
    vs = fps / cpu_fps if cpu_fps == cpu_fps and cpu_fps > 0 else None
    payload = {
        "metric": "frames_per_s_per_chip_synthetic_euroc_752x480",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "batched8_frames_per_s": round(fps_b, 2) if fps_b else None,
        "batched8_ate_max_m": round(ate_b_max, 4)
        if ate_b_max is not None else None,
        "ate_rmse_m": round(err, 4),
        "rpe_t_m": round(rp[0], 5), "rpe_r_rad": round(rp[1], 5),
        "tracking_ok_frac": round(ok, 4),
        "keyframes": n_kf,
        "n_frames": N_FRAMES,
        "scene": scene_kind, "perturb": perturb,
        "baseline_note": "vs_baseline = ratio to this same pipeline on host "
                         "CPU (provisional per BASELINE.md; reference mount "
                         "empty)",
    }
    payload.update(tim)
    payload.update(lat_stats)
    _emit(payload, gate_fail)


if __name__ == "__main__":
    main()
