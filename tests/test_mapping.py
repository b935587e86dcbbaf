"""Global multi-sequence mapping tests (config #5 path) on the simulated
8-device mesh."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_svo_tpu.config import CameraConfig, SvoConfig
from stereo_svo_tpu.engine import runner
from stereo_svo_tpu.geometry import se3
from stereo_svo_tpu.io import synthetic
from stereo_svo_tpu.parallel import mapping, mesh as mesh_mod

pytestmark = pytest.mark.slow  # compile-heavy e2e tier

CFG = SvoConfig(
    camera=CameraConfig(fx=160.0, fy=160.0, cx=94.0, cy=60.0,
                        baseline=0.11, width=188, height=120),
    grid_rows=6, grid_cols=8, max_features=48,
    num_levels=3, align_levels=3, klt_levels=2,
    stereo_max_disp=32, kf_min_tracked=15, border_margin=8,
    max_keyframes=4, ba_iters=3)


@pytest.fixture(scope="module")
def two_sequence_states():
    states = []
    for seed in (0, 4):
        lefts, rights, _ = synthetic.make_sequence(
            CFG.camera, 10, dt=0.15, kind="arc", seed=seed)
        svo = runner.StereoSvo(CFG)
        for l, r in zip(lefts, rights):
            svo.new_image(l, r)
        states.append(svo.state)
    return states


def test_build_global_map(two_sequence_states):
    gmap = mapping.build_global_map(CFG, two_sequence_states)
    B, K, N = 2, CFG.max_keyframes, CFG.max_features
    assert gmap.kf_T_wk.shape == (B * K, 3, 4)
    assert gmap.obs_uv.shape == (B * K, B * N, 2)
    # block-diagonal: no observations across sequences
    off_block = np.asarray(gmap.obs_mask[:K, N:])
    assert not off_block.any()
    assert int(gmap.kf_valid.sum()) >= 2
    assert int(gmap.X_mask.sum()) > 5


def test_optimize_global_map_runs_and_preserves_geometry(
        two_sequence_states):
    gmap = mapping.build_global_map(CFG, two_sequence_states)
    mesh = mesh_mod.make(8, axis_name="kf")
    refined, pg_cost = mapping.optimize_global_map(
        mesh, CFG.camera, CFG, gmap)
    # valid poses moved by at most a small correction (input was consistent)
    for k in np.where(np.asarray(gmap.kf_valid))[0]:
        dr, dt = se3.distance(refined.kf_T_wk[k], gmap.kf_T_wk[k])
        assert float(dt) < 0.05, f"KF{k} jumped {float(dt)}m"
    assert np.isfinite(float(pg_cost))
    assert np.isfinite(np.asarray(refined.X)).all()
