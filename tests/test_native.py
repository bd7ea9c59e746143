"""Native runtime tests: k-d tree locator and host binner vs brute force."""

import numpy as np
import pytest

from yade_openfoam_coupling_tpu.native import bindings as nb


def test_tree_nearest_matches_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.rand(500, 3)
    q = rng.rand(64, 3)
    tree = nb.MeshTree(pts)
    idx, d2 = tree.nearest(q)
    bf = ((q[:, None, :] - pts[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, bf.argmin(1))
    np.testing.assert_allclose(d2, bf.min(1), rtol=1e-12)


def test_tree_range_query():
    rng = np.random.RandomState(1)
    pts = rng.rand(300, 3)
    q = rng.rand(16, 3)
    r = 0.2
    tree = nb.MeshTree(pts)
    idx, n = tree.range_query(q, r, cap=300)
    bf = ((q[:, None, :] - pts[None]) ** 2).sum(-1) <= r * r
    for i in range(16):
        expect = set(np.nonzero(bf[i])[0].tolist())
        got = set(int(x) for x in idx[i] if x >= 0)
        assert got == expect
        assert n[i] == len(expect)


def test_bin_points_csr():
    rng = np.random.RandomState(2)
    pts = rng.rand(1000, 3)
    dims = (4, 4, 4)
    cell_of, order, cell_start = nb.bin_points(pts, (0, 0, 0), (0.25, 0.25, 0.25), dims)
    ncell = 64
    assert cell_start[-1] == 1000
    # CSR invariant: particles in order[cell_start[c]:cell_start[c+1]] are in cell c
    for c in [0, 13, 63]:
        seg = order[cell_start[c]:cell_start[c + 1]]
        assert all(cell_of[i] == c for i in seg)
    # every particle accounted for once
    assert sorted(order.tolist()) == list(range(1000))


def test_bin_points_out_of_domain():
    pts = np.array([[0.5, 0.5, 0.5], [2.0, 0.5, 0.5], [-1.0, 0, 0]])
    cell_of, order, cell_start = nb.bin_points(pts, (0, 0, 0), (1, 1, 1), (1, 1, 1))
    assert cell_of[0] == 0
    assert cell_of[1] == 1 and cell_of[2] == 1  # scrap bin
    assert cell_start[1] == 1 and cell_start[2] == 3


def test_native_build_available():
    """The toolchain is present in this image; the native path must load."""
    assert nb.available()
