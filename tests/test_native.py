"""Native C++ graph-builder bindings (skipped if the toolchain is absent)."""

import numpy as np
import pytest

try:
    from msha_gnn_tpu.data import _native

    _native._load()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="no g++ toolchain")


def test_build_csr_matches_numpy(rng):
    e, n, m = 5000, 200, 37
    s = rng.integers(0, n, e)
    r = rng.integers(0, m, e)
    w = rng.random(e).astype(np.float32)
    out_s, out_r, out_w, ptr = _native.build_csr(s, r, w, n, m)

    key = s.astype(np.int64) * m + r
    uniq, inv = np.unique(key, return_inverse=True)
    acc = np.zeros(len(uniq), np.float32)
    np.add.at(acc, inv, w)
    np.testing.assert_array_equal(out_s.astype(np.int64) * m + out_r, uniq)
    np.testing.assert_allclose(out_w, acc, rtol=1e-5)
    # CSR pointers consistent
    assert ptr[0] == 0 and ptr[-1] == len(uniq)
    np.testing.assert_array_equal(
        np.diff(ptr), np.bincount(out_s, minlength=n)
    )


def test_build_csr_rejects_out_of_range(rng):
    with pytest.raises(ValueError):
        _native.build_csr([0, 5], [0, 0], None, 5, 3)


def test_parse_int_csv(tmp_path):
    p = tmp_path / "flow.csv"
    p.write_text("a,b,c,d\n1,2,3,4\n5,6,7,8\n")
    out = _native.load_flow_csv(str(p))
    np.testing.assert_array_equal(out, [[1, 2, 3, 4], [5, 6, 7, 8]])


def test_parse_missing_file():
    with pytest.raises(FileNotFoundError):
        _native.load_flow_csv("/nonexistent/file.csv")


def test_ring_buckets_parity(rng):
    """Native linear-time bucketer == numpy lexsort path (as multisets per
    (dev, shard) bucket — within-bucket order is irrelevant to the
    segment-sum the ring schedule feeds)."""
    k, row_blk, dst_blk = 4, 25, 7
    e = 500
    s = rng.integers(0, 100, e).astype(np.int32)   # n_src = 100
    r = rng.integers(0, 26, e).astype(np.int32)    # n_dst = 26 (ragged)
    w = rng.random(e).astype(np.float32)
    s_b, rl_b, w_b = _native.ring_buckets(s, r, w, k, row_blk, dst_blk)

    dev = np.minimum(s // row_blk, k - 1)
    shard = np.minimum(r // dst_blk, k - 1)
    for i in range(k):
        for j in range(k):
            m = (dev == i) & (shard == j)
            want = sorted(zip(s[m] - i * row_blk, r[m] - j * dst_blk, w[m]))
            live = s_b[i, j] != row_blk  # pad sentinel
            got = sorted(zip(s_b[i, j][live], rl_b[i, j][live],
                             w_b[i, j][live]))
            assert got == [tuple(map(float, t)) for t in
                           [(int(a), int(b), float(c)) for a, b, c in want]]
    # pad entries carry zero weight
    assert (w_b[s_b == row_blk] == 0).all()


def test_ring_buckets_empty():
    s_b, rl_b, w_b = _native.ring_buckets(
        np.zeros(0, np.int32), np.zeros(0, np.int32), None, 2, 5, 5)
    assert s_b.shape == (2, 2, 8) and (s_b == 5).all() and (w_b == 0).all()
