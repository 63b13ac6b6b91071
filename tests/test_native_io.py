"""Native C++ IO library vs the numpy readers (oracle cross-check),
plus the prefetching DatasetLoader's ordering/termination."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from small_gicp_tpu import native
from small_gicp_tpu.utils.io import read_ply, write_ply


@pytest.fixture(scope="module")
def scan_dir(tmp_path_factory, ):
    rng = np.random.default_rng(11)
    d = tmp_path_factory.mktemp("scans")
    scans = []
    for i in range(5):
        pts = rng.uniform(-50, 50, size=(1000 + 100 * i, 3)).astype(np.float32)
        # KITTI bin: x,y,z,intensity float32
        raw = np.c_[pts, np.full(len(pts), 0.5, np.float32)]
        raw.tofile(d / f"{i:06d}.bin")
        write_ply(str(d / f"{i:06d}.ply"), pts)
        scans.append(pts)
    return d, scans


def test_native_builds():
    assert native.native_available(), "g++ toolchain expected in this image"


def test_read_kitti_bin_matches(scan_dir):
    d, scans = scan_dir
    for i, pts in enumerate(scans):
        got = native.read_kitti_bin(str(d / f"{i:06d}.bin"))
        np.testing.assert_array_equal(got, pts)


def test_read_ply_matches(scan_dir):
    d, scans = scan_dir
    for i, pts in enumerate(scans):
        got = native.read_ply_xyz(str(d / f"{i:06d}.ply"))
        ref = read_ply(str(d / f"{i:06d}.ply"))
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got, pts)


def test_loader_order_and_termination(scan_dir):
    d, scans = scan_dir
    paths = [str(d / f"{i:06d}.bin") for i in range(5)]
    loader = native.DatasetLoader(paths, max_points=4096, prefetch=2)
    got = list(loader)
    assert len(got) == 5
    for g, ref in zip(got, scans):
        np.testing.assert_array_equal(g, ref)


def test_loader_reads_ply(scan_dir):
    d, scans = scan_dir
    paths = [str(d / f"{i:06d}.ply") for i in range(3)]
    got = list(native.DatasetLoader(paths, max_points=4096))
    assert len(got) == 3
    np.testing.assert_array_equal(got[1], scans[1])


def test_loader_truncates_to_max_points(scan_dir):
    d, scans = scan_dir
    loader = native.DatasetLoader([str(d / "000004.bin")], max_points=100)
    (g,) = list(loader)
    assert g.shape == (100, 3)
    np.testing.assert_array_equal(g, scans[4][:100])
