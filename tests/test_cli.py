"""App-layer smoke tests: CLI end-to-end on synthetic data, viz dumps."""

import json
import os

import numpy as np
import pytest

from stereo_svo_tpu import cli
from stereo_svo_tpu.config import CameraConfig, SvoConfig
from stereo_svo_tpu.engine import runner
from stereo_svo_tpu.io import synthetic

pytestmark = pytest.mark.slow  # compile-heavy e2e tier


def test_cli_synthetic_run(tmp_path, capsys, monkeypatch):
    out = tmp_path / "traj.tum"
    metrics = tmp_path / "metrics.json"
    # shrink workload: patch the default config used for synthetic
    small = SvoConfig(
        camera=CameraConfig(fx=160.0, fy=160.0, cx=94.0, cy=60.0,
                            baseline=0.11, width=188, height=120),
        grid_rows=6, grid_cols=8, max_features=48, num_levels=3,
        align_levels=3, klt_levels=2, stereo_max_disp=32,
        kf_min_tracked=15, border_margin=8, max_keyframes=4)
    monkeypatch.setattr(cli, "SvoConfig", lambda: small)
    cli.main(["--dataset", "synthetic", "--frames", "6",
              "--out", str(out), "--metrics-out", str(metrics)])
    captured = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(captured)
    assert summary["frames"] == 6
    assert summary["tracking_ok_frac"] == 1.0
    assert os.path.exists(out) and len(open(out).readlines()) == 6
    assert os.path.exists(metrics)


def test_viz_dumps(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from stereo_svo_tpu.utils import viz

    cfg = SvoConfig(
        camera=CameraConfig(fx=160.0, fy=160.0, cx=94.0, cy=60.0,
                            baseline=0.11, width=188, height=120),
        grid_rows=6, grid_cols=8, max_features=48, num_levels=3,
        align_levels=3, klt_levels=2, stereo_max_disp=32,
        kf_min_tracked=15, border_margin=8, max_keyframes=4)
    lefts, rights, gt = synthetic.make_sequence(cfg.camera, 3, kind="arc")
    svo = runner.StereoSvo(cfg)
    for l, r in zip(lefts, rights):
        svo.new_image(l, r)
    f = str(tmp_path / "overlay.png")
    viz.draw_features(lefts[-1], svo.state, path=f)
    assert os.path.getsize(f) > 0
    t = str(tmp_path / "traj.png")
    viz.draw_trajectory(svo.trajectory(), gt=gt, path=t)
    assert os.path.getsize(t) > 0
