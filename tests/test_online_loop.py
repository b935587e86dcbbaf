"""Online (engine-integrated) loop closure: a revisit repairs drift
DURING the run, not post-hoc (VERDICT r3 next #5).

Reference parity: none — the reference is pure odometry (SURVEY.md §5.3);
the pose-graph layer [SPEC] plus the long-horizon memory bank make live
loop closing possible, and ``cfg.online_loop_every`` turns it on.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_svo_tpu.backend import loop_closure
from stereo_svo_tpu.config import CameraConfig, SvoConfig
from stereo_svo_tpu.engine import runner
from stereo_svo_tpu.geometry import se3
from stereo_svo_tpu.io import synthetic

# Stronger rig than the other small-camera tests: fx·baseline sets stereo
# depth precision (σ_z ≈ z²/(fx·b) per px). At fx=240/b=0.11 a 7 cm pose
# shift costs only ~0.1 px of reprojection RMS — the drift-repair signal
# would drown in the map's own depth noise.
CAM = CameraConfig(fx=380.0, fy=380.0, cx=188.0, cy=120.0,
                   baseline=0.25, width=376, height=240)


def _small_cfg(**kw):
    base = dict(camera=CAM, grid_rows=8, grid_cols=10, max_features=80,
                num_levels=3, align_levels=3, klt_levels=3,
                stereo_max_disp=48, kf_min_tracked=25, border_margin=10,
                max_keyframes=3, mem_keyframes=12,
                kf_dist_ratio=0.05, loop_min_gap=15, loop_min_score=0.75)
    base.update(kw)
    return SvoConfig(**base)


def test_propose_online_finds_the_matching_bank_entry():
    """The incremental proposal must rank the bank slot whose thumbnail
    matches the query first, and never propose inside the temporal gap."""
    cfg = _small_cfg()
    rng = np.random.default_rng(0)
    M = cfg.mem_keyframes
    th, tw = cfg.thumb_shape
    thumbs = jnp.asarray(rng.uniform(0, 255, (M, th, tw)).astype(np.float32))
    desc = jax.vmap(lambda t: loop_closure.descriptor(
        t, cfg.loop_desc_rows, cfg.loop_desc_cols))(thumbs)
    valid = jnp.ones(M, bool)
    stamp = jnp.arange(M, dtype=jnp.int32) * 10          # 0,10,...,110
    m_new = jnp.asarray(M - 1, jnp.int32)                # stamp 110
    # query = slot 3's own thumbnail (stamp 30 → gap 80 >= 15)
    props = loop_closure.propose_online(cfg, desc, valid, stamp, m_new,
                                        thumbs[3])
    assert int(props.edges_ij[0, 0]) == 3
    assert bool(props.valid[0])
    assert int(props.edges_ij[0, 1]) == M - 1
    # every proposed partner respects the temporal gap (no self-loops)
    for e in range(cfg.online_loop_edges):
        if bool(props.valid[e]):
            gap = abs(int(stamp[props.edges_ij[e, 0]]) - 110)
            assert gap >= cfg.loop_min_gap


def _inject_world_offset(state, D):
    """Inject a drift event: offset the RECENT segment of the estimate
    (current/template poses, the whole BA window, and the window's memory
    copies) while older memory-bank poses stay put — exactly how
    accumulated drift manifests (the past is where it was; the present is
    off, and image-space measurements / camera-frame templates are
    unaffected). Shifting EVERYTHING instead would be a pure gauge change
    that loop closure cannot and must not undo. T_wk' = D ∘ T_wk for
    cam→world poses; T_cw' = T_cw ∘ D⁻¹ for world→cam poses."""
    D = jnp.asarray(D)
    Dinv = se3.inverse(D)

    def wk(T):          # (...,3,4) cam→world
        return jax.vmap(lambda t: se3.compose(D, t))(T)

    owned = jnp.zeros(state.mem_valid.shape[0], bool).at[
        jnp.where(state.kf_valid
                  & (state.mem_stamp[state.kf_mem] == state.kf_stamp),
                  state.kf_mem, state.mem_valid.shape[0])
    ].set(True, mode="drop")
    return state._replace(
        T_cw=se3.compose(state.T_cw, Dinv),
        T_pw=se3.compose(state.T_pw, Dinv),
        kf_T_wk=jnp.where(state.kf_valid[:, None, None],
                          wk(state.kf_T_wk), state.kf_T_wk),
        mem_T_wk=jnp.where(owned[:, None, None],
                           wk(state.mem_T_wk), state.mem_T_wk))


@pytest.mark.slow
def test_online_loop_repairs_injected_drift_at_revisit():
    """Out-and-back sequence; a rigid 8 cm drift event is injected into
    the LIVE state mid-run (frame 30). With online_loop_every=1 the
    revisit must (a) accept ≥1 loop edge during the run and (b) pull the
    live pose error at the end of the run well below the injected offset.
    The control run (online loop closure off) must stay drifted — the
    repair is attributable to the online path, not to tracking."""
    n = 60
    lefts, rights, gt = synthetic.make_sequence(CAM, n, dt=0.25,
                                                kind="loop", seed=0)
    D = se3.exp(jnp.asarray([0.05, 0.02, -0.05, 0.004, -0.006, 0.003],
                            jnp.float32))
    inj_t = float(jnp.linalg.norm(se3.translation(D)))

    results = {}
    for every in (1, 0):
        cfg = _small_cfg(online_loop_every=every)
        svo = runner.StereoSvo(cfg)
        for i in range(n):
            if i == 30:
                svo.state = _inject_world_offset(svo.state, D)
            svo.new_image(lefts[i], rights[i])
        traj = svo.trajectory()
        err = np.linalg.norm(traj[:, :, 3] - gt[:, :, 3], axis=1)
        results[every] = (err, svo.state)

    err_on, st_on = results[1]
    err_off, st_off = results[0]
    # injection took: error AT frame 30 is ~the offset in both runs
    # (frame 30 is tracked from the injected state and no keyframe — so
    # no online correction — can have run yet; by frame 31 the ON run may
    # already have repaired it)
    assert err_off[30] > 0.6 * inj_t, err_off[30]
    assert err_on[30] > 0.4 * inj_t, err_on[30]
    # control stays drifted to the end (odometry cannot remove a world
    # offset; window BA must not silently absorb it either)
    assert err_off[-5:].mean() > 0.5 * inj_t, err_off[-5:]
    # online path: edges accepted, tail error pulled down. The repair is
    # partial by design: the graph splits the discrepancy between the
    # loop edge and the spanning odometry edge, and the significance
    # floor (online_loop_min_t) stops noise-level follow-up corrections
    # — measured steady state ≈ 0.03-0.04 vs control ≈ 0.06 for an
    # 0.075 m injection.
    assert int(st_on.n_loop_closures) >= 1
    assert int(st_off.n_loop_closures) == 0
    assert err_on[-5:].mean() < 0.75 * err_off[-5:].mean(), (
        err_on[-5:].mean(), err_off[-5:].mean())
    assert err_on[-5:].mean() < 0.65 * inj_t, err_on[-5:].mean()
    assert np.isfinite(np.asarray(st_on.T_cw)).all()


@pytest.mark.slow
def test_online_loop_noop_without_revisit():
    """A forward-only sequence proposes no (or only rejected) edges; the
    online path must leave the trajectory identical to the control —
    no spurious corrections on loop-free motion."""
    n = 30
    lefts, rights, gt = synthetic.make_sequence(CAM, n, dt=0.1,
                                                kind="arc", seed=1)
    trajs = {}
    for every in (1, 0):
        cfg = _small_cfg(online_loop_every=every, loop_min_gap=8)
        svo = runner.StereoSvo(cfg)
        for i in range(n):
            svo.new_image(lefts[i], rights[i])
        trajs[every] = (svo.trajectory(), int(svo.state.n_loop_closures))
    t_on, n_edges = trajs[1]
    t_off, _ = trajs[0]
    err_on = np.linalg.norm(t_on[:, :, 3] - gt[:, :, 3], axis=1).max()
    err_off = np.linalg.norm(t_off[:, :, 3] - gt[:, :, 3], axis=1).max()
    # any accepted edge on forward motion must at least not hurt; with
    # none accepted the trajectories are bit-identical
    if n_edges == 0:
        np.testing.assert_allclose(t_on, t_off, atol=0)
    else:
        assert err_on < max(2.0 * err_off, 0.02), (err_on, err_off)
