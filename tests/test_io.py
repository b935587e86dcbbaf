"""IO-layer tests: dataset readers on generated fixtures, YAML calib,
trajectory format round-trips (SURVEY.md §2.1 app-layer parity)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from stereo_svo_tpu.config import SvoConfig
from stereo_svo_tpu.eval import ate
from stereo_svo_tpu.geometry import se3
from stereo_svo_tpu.io import calib, datasets, trajectory

import jax.numpy as jnp


def _write_png(path, img):
    cv2.imwrite(path, img.astype(np.uint8))


@pytest.fixture()
def euroc_fixture(tmp_path):
    """Minimal EuRoC ASL tree with 3 frames."""
    root = tmp_path / "MH_99"
    for cam in ("cam0", "cam1"):
        (root / "mav0" / cam / "data").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        ts = 1403636579763555584 + i * 50000000
        img = rng.uniform(0, 255, (480, 752))
        for cam in ("cam0", "cam1"):
            _write_png(str(root / "mav0" / cam / "data" / f"{ts}.png"),
                       img + (0 if cam == "cam0" else 1))
        rows.append(f"{ts},{ts}.png")
    for cam in ("cam0", "cam1"):
        with open(root / "mav0" / cam / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n" + "\n".join(rows) + "\n")
    gt_dir = root / "mav0" / "state_groundtruth_estimate0"
    gt_dir.mkdir(parents=True)
    with open(gt_dir / "data.csv", "w") as f:
        f.write("#ts,px,py,pz\n")
        for i in range(3):
            ts = 1403636579763555584 + i * 50000000
            f.write(f"{ts},{0.1*i},{0.2*i},{0.3*i}\n")
    return str(root)


def test_euroc_reader(euroc_fixture):
    frames = list(datasets.euroc_frames(euroc_fixture))
    assert len(frames) == 3
    l, r, ts = frames[0]
    assert l.shape == (480, 752) and l.dtype == np.float32
    assert abs(frames[1][2] - frames[0][2] - 0.05) < 1e-6
    ts_gt, pos = datasets.euroc_ground_truth(euroc_fixture)
    assert pos.shape == (3, 3)


@pytest.fixture()
def kitti_fixture(tmp_path):
    root = tmp_path / "kitti"
    base = root / "sequences" / "00"
    for d in ("image_0", "image_1"):
        (base / d).mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(2):
        img = rng.uniform(0, 255, (376, 1241))
        _write_png(str(base / "image_0" / f"{i:06d}.png"), img)
        _write_png(str(base / "image_1" / f"{i:06d}.png"), img)
    with open(base / "times.txt", "w") as f:
        f.write("0.0\n0.103\n")
    return str(root)


def test_kitti_reader(kitti_fixture):
    frames = list(datasets.kitti_frames(kitti_fixture, "00"))
    assert len(frames) == 2
    assert frames[0][0].shape == (376, 1241)
    assert abs(frames[1][2] - 0.103) < 1e-9


def test_kitti_pose_file_roundtrip(tmp_path):
    T = np.stack([np.asarray(se3.exp(jnp.asarray(
        [0.1 * i, 0, 0.2 * i, 0, 0.01 * i, 0], jnp.float32)))
        for i in range(4)])
    path = str(tmp_path / "poses.txt")
    trajectory.save_kitti(path, T)
    T2 = datasets.kitti_poses(path)
    np.testing.assert_allclose(T2, T, atol=1e-6)


def test_flat_yaml_calib(tmp_path):
    path = str(tmp_path / "calib.yaml")
    with open(path, "w") as f:
        f.write("fx: 500.0\nfy: 501.0\ncx: 320.0\ncy: 240.0\n"
                "baseline: 0.12\nwidth: 640\nheight: 480\n"
                "num_levels: 3\nalign_levels: 3\nklt_levels: 3\n"
                "fast_threshold: 15.0\n")
    cfg = calib.load_flat_yaml(path)
    assert cfg.camera.fx == 500.0 and cfg.camera.baseline == 0.12
    assert cfg.num_levels == 3 and cfg.fast_threshold == 15.0
    # untouched fields keep defaults
    assert cfg.klt_patch == SvoConfig().klt_patch


def test_tum_roundtrip(tmp_path):
    T = np.stack([np.asarray(se3.exp(jnp.asarray(
        [0.1 * i, -0.05 * i, 0.2 * i, 0.02 * i, 0.01 * i, -0.03 * i],
        jnp.float32))) for i in range(5)])
    path = str(tmp_path / "traj.txt")
    trajectory.save_tum(path, T, timestamps=np.arange(5) * 0.1)
    ts, pos = trajectory.load_tum(path)
    np.testing.assert_allclose(pos, T[:, :, 3], atol=1e-5)
    np.testing.assert_allclose(ts, np.arange(5) * 0.1, atol=1e-6)


def test_ate_alignment_invariance():
    """ATE must be invariant to a rigid transform of the estimate."""
    rng = np.random.default_rng(2)
    gt = rng.normal(size=(50, 3)).cumsum(axis=0)
    R = np.asarray(se3.rotation(se3.exp(jnp.asarray(
        [0, 0, 0, 0.3, -0.2, 0.5], jnp.float32))))
    est = (R @ gt.T).T + np.asarray([4.0, -2.0, 1.0])
    assert ate.ate_rmse(est, gt) < 1e-5
    # and sensitive to actual noise
    est2 = est + rng.normal(0, 0.05, est.shape)
    assert 0.02 < ate.ate_rmse(est2, gt) < 0.1


def test_euroc_sensor_yaml_rectification(tmp_path):
    """EuRoC-style sensor.yaml pair → rectified config with sane params."""
    K = [458.654, 457.296, 367.215, 248.375]
    D = [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05]
    T_BS0 = np.eye(4)
    T_BS1 = np.eye(4)
    T_BS1[0, 3] = 0.11  # cam1 is 11cm to the right
    for name, tbs, k in (("cam0.yaml", T_BS0, K), ("cam1.yaml", T_BS1, K)):
        with open(tmp_path / name, "w") as f:
            f.write(
                "camera_model: pinhole\n"
                f"intrinsics: [{k[0]}, {k[1]}, {k[2]}, {k[3]}]\n"
                "distortion_model: radial-tangential\n"
                f"distortion_coefficients: {D}\n"
                "resolution: [752, 480]\n"
                "T_BS:\n  rows: 4\n  cols: 4\n"
                f"  data: {tbs.reshape(-1).tolist()}\n")
    cfg, rect = calib.euroc_rectified_config(
        str(tmp_path / "cam0.yaml"), str(tmp_path / "cam1.yaml"))
    assert abs(cfg.camera.baseline - 0.11) < 5e-3
    assert 300 < cfg.camera.fx < 600
    l = np.zeros((480, 752), np.float32)
    r = np.zeros((480, 752), np.float32)
    lr, rr = rect(l, r)
    assert lr.shape == (480, 752)


def test_video_frames_side_by_side_and_two_file(tmp_path):
    """video_frames: side-by-side single stream and two-stream variants."""
    rng = np.random.default_rng(3)
    h, w, n = 48, 64, 4
    frames_l = rng.uniform(0, 255, (n, h, w)).astype(np.uint8)
    frames_r = rng.uniform(0, 255, (n, h, w)).astype(np.uint8)

    fourcc = cv2.VideoWriter_fourcc(*"MJPG")

    def write_video(path, frames):
        vw = cv2.VideoWriter(path, fourcc, 10.0,
                             (frames.shape[2], frames.shape[1]))
        assert vw.isOpened(), "cv2 VideoWriter backend unavailable"
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
        vw.release()

    # side-by-side stream
    sbs = np.concatenate([frames_l, frames_r], axis=2)
    p_sbs = str(tmp_path / "sbs.avi")
    write_video(p_sbs, sbs)
    got = list(datasets.video_frames(p_sbs))
    assert len(got) == n
    l0, r0, t0 = got[0]
    assert l0.shape == (h, w) and r0.shape == (h, w) and t0 == 0.0
    # MJPG is lossy; content must still correlate with the source
    assert np.corrcoef(l0.reshape(-1), frames_l[0].reshape(-1))[0, 1] > 0.9
    assert np.corrcoef(r0.reshape(-1), frames_r[0].reshape(-1))[0, 1] > 0.9
    # timestamps follow the encoded fps
    assert abs(got[1][2] - 0.1) < 1e-6

    # two-file variant
    p_l = str(tmp_path / "l.avi")
    p_r = str(tmp_path / "r.avi")
    write_video(p_l, frames_l)
    write_video(p_r, frames_r)
    got2 = list(datasets.video_frames(p_l, p_r))
    assert len(got2) == n
    assert got2[2][0].shape == (h, w)
    assert np.corrcoef(got2[2][1].reshape(-1),
                       frames_r[2].reshape(-1))[0, 1] > 0.9


def test_checkpoint_format_v2_path_keys_and_migration(tmp_path):
    """Checkpoint leaves are keyed by pytree path (ADVICE r4): adding a
    field to the state no longer breaks old checkpoints — missing keys
    keep the load-template's value — and the v1 index format still reads
    when the leaf count matches."""
    from typing import NamedTuple

    from stereo_svo_tpu.utils import checkpoint

    class Old(NamedTuple):
        mu: np.ndarray
        nested: dict

    class New(NamedTuple):
        mu: np.ndarray
        nested: dict
        extra: np.ndarray          # field added after the file was written

    old = Old(mu=np.arange(4.0), nested={"a": np.ones((2, 2))})
    p = str(tmp_path / "v2.npz")
    checkpoint.save(p, old)

    # same-structure roundtrip
    back = checkpoint.load(p, Old(mu=np.zeros(4), nested={"a": np.zeros((2, 2))}))
    np.testing.assert_array_equal(back.mu, old.mu)
    np.testing.assert_array_equal(back.nested["a"], old.nested["a"])

    # newer structure: the added leaf keeps the template default
    tmpl = New(mu=np.zeros(4), nested={"a": np.zeros((2, 2))},
               extra=np.full(3, 7.0))
    mig = checkpoint.load(p, tmpl)
    np.testing.assert_array_equal(mig.mu, old.mu)
    np.testing.assert_array_equal(mig.extra, np.full(3, 7.0))

    # v1 legacy file (index-keyed) still loads on exact structure match
    import jax

    leaves, _ = jax.tree.flatten(old)
    p1 = str(tmp_path / "v1.npz")
    np.savez(p1, **{f"leaf_{i}": np.asarray(x)
                    for i, x in enumerate(leaves)})
    legacy = checkpoint.load(
        p1, Old(mu=np.zeros(4), nested={"a": np.zeros((2, 2))}))
    np.testing.assert_array_equal(legacy.mu, old.mu)
