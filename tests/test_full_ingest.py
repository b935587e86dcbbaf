"""Full-ingest end-to-end: PNGs on disk → (native) loader → calibration →
rectification → engine → exported trajectory → ATE gate, all through the
CLI app surface (VERDICT r3 next #7 — the parity tests only sampled the
pieces of this path, never the whole chain).

Reference parity: the app main loop over a dataset directory
(SURVEY.md §3.4; src/app/main.cpp [UNVERIFIED]) — here the "dataset" is a
synthetic sequence written to disk in the real EuRoC-ASL / KITTI layouts,
so decode, CSV/timestamp parsing, sensor.yaml → stereoRectify, and the
uint8 quantization of real files are all exercised with exact ground
truth available.
"""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from stereo_svo_tpu import cli
from stereo_svo_tpu.config import CameraConfig
from stereo_svo_tpu.eval import ate as ate_mod
from stereo_svo_tpu.io import synthetic, trajectory

pytestmark = pytest.mark.slow  # compile-heavy e2e tier

CAM = CameraConfig(fx=240.0, fy=240.0, cx=188.0, cy=120.0,
                   baseline=0.11, width=376, height=240)
N_FRAMES = 24

FLAT_CALIB = """
grid_rows: 10
grid_cols: 13
max_features: 130
num_levels: 3
align_levels: 3
klt_levels: 3
stereo_max_disp: 64
kf_min_tracked: 40
border_margin: 10
"""

SENSOR_YAML = """\
sensor_type: camera
T_BS:
  rows: 4
  cols: 4
  data: [1.0, 0.0, 0.0, {tx}, 0.0, 1.0, 0.0, 0.0,
         0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0]
rate_hz: 20
resolution: [{w}, {h}]
camera_model: pinhole
intrinsics: [{fx}, {fy}, {cx}, {cy}]
distortion_model: radial-tangential
distortion_coefficients: [0.0, 0.0, 0.0, 0.0]
"""


@pytest.fixture(scope="module")
def rendered():
    return synthetic.make_sequence(CAM, N_FRAMES, dt=0.1, kind="arc",
                                   seed=0)


def _write_euroc(tmp_path, lefts, rights):
    root = tmp_path / "seq"
    for side, imgs in (("cam0", lefts), ("cam1", rights)):
        d = root / "mav0" / side / "data"
        d.mkdir(parents=True)
        rows = []
        for i, img in enumerate(imgs):
            ts = 1403636579763555584 + i * 50_000_000  # EuRoC-style ns
            name = f"{ts}.png"
            cv2.imwrite(str(d / name), np.clip(img, 0, 255).astype(np.uint8))
            rows.append(f"{ts},{name}\n")
        with open(root / "mav0" / side / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            f.writelines(rows)
        y = SENSOR_YAML.format(tx=0.0 if side == "cam0" else CAM.baseline,
                               w=CAM.width, h=CAM.height, fx=CAM.fx,
                               fy=CAM.fy, cx=CAM.cx, cy=CAM.cy)
        with open(root / "mav0" / side / "sensor.yaml", "w") as f:
            f.write(y)
    return root


def _run_cli(tmp_path, root, gt, extra=()):
    flat = tmp_path / "algo.yaml"
    flat.write_text(FLAT_CALIB)
    out = tmp_path / "traj.tum"
    argv = ["--dataset", "euroc", "--root", str(root),
            "--cam0-yaml", str(root / "mav0" / "cam0" / "sensor.yaml"),
            "--cam1-yaml", str(root / "mav0" / "cam1" / "sensor.yaml"),
            "--calib", str(flat), "--out", str(out), *extra]
    cli.main(argv)
    _, pos = trajectory.load_tum(str(out))     # (N,), (N,3)
    assert pos.shape[0] == N_FRAMES
    err = ate_mod.ate_rmse(pos, ate_mod.positions(np.asarray(gt)))
    return err


def test_euroc_layout_png_to_ate(tmp_path, rendered, capsys):
    """PNG decode → data.csv pairing → sensor.yaml → stereoRectify →
    remap → engine → TUM export → ATE. The rectification here is a real
    cv2.initUndistortRectifyMap/remap round trip (zero distortion, so the
    rectified intrinsics must reproduce the render camera — itself an
    assertion on the calib chain)."""
    lefts, rights, gt = rendered
    root = _write_euroc(tmp_path, lefts, rights)
    err = _run_cli(tmp_path, root, gt)
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames"] == N_FRAMES
    assert summary["tracking_ok_frac"] == 1.0
    # uint8 quantization + remap interpolation sit on top of the usual
    # small-rig odometry error; 5 cm over a ~1 m arc is the loose bound
    assert err < 0.05, err


def test_euroc_native_loader_to_ate(tmp_path, rendered, capsys):
    """Same chain, but decode/prefetch through the C++ frame loader
    (native/frameloader.cpp) via --native-loader: proves the native
    loader feeds the full pipeline, not just the reader-parity test."""
    from stereo_svo_tpu.io import native_loader

    if not native_loader.available():
        pytest.skip("native loader not built and unbuildable here")
    lefts, rights, gt = rendered
    root = _write_euroc(tmp_path, lefts, rights)
    err = _run_cli(tmp_path, root, gt, extra=("--native-loader",))
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames"] == N_FRAMES
    assert summary["tracking_ok_frac"] == 1.0
    assert err < 0.05, err


KITTI_FLAT_CALIB = FLAT_CALIB + f"""
fx: {CAM.fx}
fy: {CAM.fy}
cx: {CAM.cx}
cy: {CAM.cy}
baseline: {CAM.baseline}
width: {CAM.width}
height: {CAM.height}
"""


def _write_kitti(tmp_path, lefts, rights):
    """KITTI odometry disk layout: sequences/<seq>/image_{0,1}/*.png +
    times.txt (datasets.kitti_frames / native_loader.kitti_native)."""
    base = tmp_path / "kitti" / "sequences" / "00"
    for side, imgs in (("image_0", lefts), ("image_1", rights)):
        d = base / side
        d.mkdir(parents=True)
        for i, img in enumerate(imgs):
            cv2.imwrite(str(d / f"{i:06d}.png"),
                        np.clip(img, 0, 255).astype(np.uint8))
    with open(base / "times.txt", "w") as f:
        f.writelines(f"{i * 0.1:.6e}\n" for i in range(len(lefts)))
    return tmp_path / "kitti"


def _run_cli_kitti(tmp_path, root, gt, extra=()):
    flat = tmp_path / "algo_kitti.yaml"
    flat.write_text(KITTI_FLAT_CALIB)
    out = tmp_path / "traj_kitti.tum"
    argv = ["--dataset", "kitti", "--root", str(root), "--seq", "00",
            "--calib", str(flat), "--out", str(out), *extra]
    cli.main(argv)
    _, pos = trajectory.load_tum(str(out))
    assert pos.shape[0] == N_FRAMES
    return ate_mod.ate_rmse(pos, ate_mod.positions(np.asarray(gt)))


def test_kitti_layout_png_to_ate(tmp_path, rendered, capsys):
    """KITTI disk layout through --dataset kitti (VERDICT r4 next #8: the
    EuRoC chain was e2e-proven in r4, the KITTI layout never was): PNG
    decode → image_0/image_1 pairing → times.txt → flat-calib override of
    kitti_config → engine → TUM export → ATE."""
    lefts, rights, gt = rendered
    root = _write_kitti(tmp_path, lefts, rights)
    err = _run_cli_kitti(tmp_path, root, gt)
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames"] == N_FRAMES
    assert summary["tracking_ok_frac"] == 1.0
    assert err < 0.05, err


def test_kitti_native_loader_to_ate(tmp_path, rendered, capsys):
    """Same KITTI chain through the C++ frame loader (--native-loader)."""
    from stereo_svo_tpu.io import native_loader

    if not native_loader.available():
        pytest.skip("native loader not built and unbuildable here")
    lefts, rights, gt = rendered
    root = _write_kitti(tmp_path, lefts, rights)
    err = _run_cli_kitti(tmp_path, root, gt, extra=("--native-loader",))
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames"] == N_FRAMES
    assert summary["tracking_ok_frac"] == 1.0
    assert err < 0.05, err
