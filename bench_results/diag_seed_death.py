#!/usr/bin/env python
"""Seed-death-rate with/without the epipolar recovery path (VERDICT r1 #4
done-criterion, finally measured — r2 shipped the path, not the number).

Runs the default bench sequence WITH photometric perturbation (the KLT-
failure regime the epipolar search exists for) twice: epi_samples=16 vs 0.
"""
import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from stereo_svo_tpu.config import SvoConfig
from stereo_svo_tpu.engine import runner
from stereo_svo_tpu.eval import ate
from stereo_svo_tpu.io import synthetic

N = 100
base = SvoConfig()
cam = base.camera
scene = synthetic.default_scene(0)
render = jax.jit(lambda T: synthetic.render_stereo(cam, T, scene))
pert = jax.jit(synthetic.perturb_stereo)
key = jax.random.PRNGKey(0)
lefts, rights, gts = [], [], []
for i in range(N):
    T = synthetic.trajectory_pose(jnp.asarray(i * 0.08, jnp.float32))
    l, r = render(T)
    key, sub = jax.random.split(key)
    l, r = pert(l, r, sub)
    lefts.append(l)
    rights.append(r)
    gts.append(np.asarray(T))
lefts, rights = jnp.stack(lefts), jnp.stack(rights)
gt = np.stack(gts)

for name, overrides in (("epi_on", {}), ("epi_off", {"epi_samples": 0})):
    cfg = dataclasses.replace(base, **overrides)
    run = jax.jit(lambda l, r, c=cfg: runner.run_sequence_scan(c, l, r))
    state, outs = run(lefts, rights)
    jax.block_until_ready(outs.T_wc)
    deaths = int(np.asarray(outs.n_seed_deaths).sum())
    recov = int(np.asarray(outs.n_epi_recovered).sum())
    err = ate.ate_rmse(ate.positions(np.asarray(outs.T_wc)),
                       ate.positions(gt))
    print(json.dumps({
        "variant": name, "seed_deaths_total": deaths,
        "epi_recovered_total": recov,
        "deaths_per_frame": round(deaths / N, 2),
        "ate_m": round(err, 4),
        "tracking_ok": round(float(np.asarray(outs.tracking_ok).mean()), 3),
        "landmarks_final": int(np.asarray(outs.n_landmarks)[-1])}),
        flush=True)
