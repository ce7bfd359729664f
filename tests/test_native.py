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
