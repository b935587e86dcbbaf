"""Native C++ frame loader vs the pure-Python readers (same frames, same
order), including rectification-map parity."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from stereo_svo_tpu.io import datasets, native_loader


@pytest.fixture()
def kitti_fixture(tmp_path):
    base = tmp_path / "kitti" / "sequences" / "00"
    for d in ("image_0", "image_1"):
        (base / d).mkdir(parents=True)
    rng = np.random.default_rng(4)
    for i in range(5):
        l = rng.uniform(0, 255, (48, 64)).astype(np.uint8)
        r = rng.uniform(0, 255, (48, 64)).astype(np.uint8)
        cv2.imwrite(str(base / "image_0" / f"{i:06d}.png"), l)
        cv2.imwrite(str(base / "image_1" / f"{i:06d}.png"), r)
    with open(base / "times.txt", "w") as f:
        f.writelines(f"{i*0.1}\n" for i in range(5))
    return str(tmp_path / "kitti")


def test_native_matches_python_reader(kitti_fixture):
    if not native_loader.available():
        pytest.skip("native loader not built and unbuildable here")
    py_frames = list(datasets.kitti_frames(kitti_fixture, "00"))
    nat = native_loader.kitti_native(kitti_fixture, "00", n_threads=3,
                                     prefetch=4)
    nat_frames = list(nat)
    assert len(nat_frames) == len(py_frames) == 5
    for (pl, pr, pt), (nl, nr, nt) in zip(py_frames, nat_frames):
        np.testing.assert_array_equal(nl, pl)
        np.testing.assert_array_equal(nr, pr)
        assert abs(nt - pt) < 1e-9


def test_native_in_order_under_concurrency(kitti_fixture):
    if not native_loader.available():
        pytest.skip("native loader not built")
    # many threads + tiny prefetch: frames must still arrive in order
    nat = native_loader.kitti_native(kitti_fixture, "00", n_threads=4,
                                     prefetch=2)
    ts = [t for _, _, t in nat]
    assert ts == sorted(ts) and len(ts) == 5
