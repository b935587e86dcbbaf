#!/usr/bin/env python
"""Separate fixed per-run (tunnel dispatch+fetch) overhead from true
per-frame scan cost: time the full-pipeline scan at several sequence
lengths and fit time = intercept + slope * n_frames.

Motivation (VERDICT r3 next #1/#9): the r4 accounting found model_frame
1.10 ms vs measured 1.76 ms at n=100. If the gap is a per-RUN constant
(remote PJRT round trips), it is a sandbox artifact, not pipeline cost."""
import os, sys, time, json
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.getcwd())
import jax, numpy as np
import bench
from stereo_svo_tpu.config import SvoConfig
from stereo_svo_tpu.engine import runner

cfg = SvoConfig()
lefts, rights, _ = bench._render_sequence(cfg.camera, 100)
rows = []
for n in (20, 40, 60, 100):
    l, r = lefts[:n], rights[:n]
    run = jax.jit(lambda a, b: runner.run_sequence_scan(cfg, a, b))
    st, outs = run(l, r); np.asarray(outs.tracking_ok); jax.block_until_ready(st)
    ts = []
    while len(ts) < 5:
        t0 = time.perf_counter()
        st, outs = run(l, r)
        np.asarray(outs.tracking_ok); jax.block_until_ready(st)
        dt = time.perf_counter() - t0
        if dt > n * 1e-4: ts.append(dt)
    rows.append((n, float(np.median(ts)) * 1e3))
    print(json.dumps({"n": n, "total_ms": round(rows[-1][1], 2)}), flush=True)
ns = np.array([r[0] for r in rows], float)
ms = np.array([r[1] for r in rows], float)
A = np.vstack([ns, np.ones_like(ns)]).T
slope, intercept = np.linalg.lstsq(A, ms, rcond=None)[0]
print(json.dumps({"slope_ms_per_frame": round(float(slope), 4),
                  "intercept_ms_per_run": round(float(intercept), 2),
                  "fps_true": round(1000.0 / slope, 1),
                  "fps_at_100_raw": round(100.0 / (ms[-1] / 1e3), 1)}))
