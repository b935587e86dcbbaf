"""Organic-drift loop closure: detect → repair with NO injection.

VERDICT r3 #6 / r4 #6: the other loop tests (test_online_loop,
test_mem_retention) repair drift that is INJECTED into the state; this one
lets odometry drift accumulate organically — a large out-and-back
trajectory ('loop_far': ~1.8 m forward excursions against planes at ~4 m)
on a starved feature budget (48 slots) — until it exceeds the loop edges'
measured noise, then asserts the ONLINE path detects the revisit and the
live pose error drops across the applied correction.

The run is deterministic on the CPU test backend (same renders, same
arithmetic), so the organically-drifted error profile is reproducible.
"""

import numpy as np
import pytest

from stereo_svo_tpu.config import CameraConfig, SvoConfig
from stereo_svo_tpu.engine import runner
from stereo_svo_tpu.io import synthetic

pytestmark = pytest.mark.slow

CAM = CameraConfig(fx=380.0, fy=380.0, cx=188.0, cy=120.0,
                   baseline=0.25, width=376, height=240)


def _cfg(**kw):
    base = dict(camera=CAM, grid_rows=6, grid_cols=8, max_features=48,
                num_levels=3, align_levels=3, klt_levels=3,
                stereo_max_disp=48, kf_min_tracked=16, border_margin=10,
                max_keyframes=3, mem_keyframes=12,
                kf_dist_ratio=0.05, loop_min_gap=15, loop_min_score=0.7)
    base.update(kw)
    return SvoConfig(**base)


def test_online_loop_repairs_organic_drift_no_injection():
    """Measured profile this scenario reproduces (CPU backend is
    deterministic): the control accumulates ~0.74 m of real drift over
    the excursion; with the online path ON, ONE correction fires at the
    revisit (~frame 32), the live error drops 0.457 → 0.063 across it,
    and the tail runs ~5x more accurate than the control (0.154 vs
    0.735)."""
    n = 60
    lefts, rights, gt = synthetic.make_sequence(CAM, n, dt=0.25,
                                                kind="loop_far", seed=0)
    results = {}
    for every in (0, 1):
        svo = runner.StereoSvo(_cfg(online_loop_every=every))
        loops = []
        for i in range(n):
            svo.new_image(lefts[i], rights[i])
            loops.append(int(svo.state.n_loop_closures))
        traj = svo.trajectory()
        err = np.linalg.norm(traj[:, :, 3] - gt[:, :, 3], axis=1)
        results[every] = (err, np.asarray(loops), svo.state)

    err_off, loops_off, _ = results[0]
    err_on, loops_on, st_on = results[1]
    fires = np.where(np.diff(loops_on) > 0)[0] + 1

    # control: real organic drift, and (by definition) no corrections
    assert loops_off[-1] == 0
    assert err_off[-5:].mean() > 0.25, err_off[-5:]
    # (a) a revisit is detected and a correction applied ORGANICALLY —
    # nothing was injected into the state
    assert len(fires) >= 1, "no online loop correction ever fired"
    f = int(fires[0])
    # (b) the organically accumulated error at the first firing is far
    # above the adaptive (round-trip-scaled) noise floor — real drift
    assert err_on[f - 1] > 0.1, err_on[f - 1]
    # (c) … and the live pose error DROPS across the applied correction
    post = err_on[min(f + 2, n - 1)]
    assert post < 0.5 * err_on[f - 1], (err_on[f - 1], post)
    # (d) the repaired run beats the drifted control from there on
    assert err_on[-5:].mean() < 0.5 * err_off[-5:].mean(), (
        err_on[-5:].mean(), err_off[-5:].mean())
    assert np.isfinite(np.asarray(st_on.T_cw)).all()
