"""Explainer artefacts from factored attention."""

import numpy as np
import jax.numpy as jnp

from msha_gnn_tpu.explain import clique_members, extract_attention
from msha_gnn_tpu.graph import Grouping
import pytest


def test_clique_members(rng):
    gid = np.array([0, 1, 0, 2, 1, 0])
    grp = Grouping.from_ids(gid)
    members = clique_members(grp)
    assert members[0] == [0, 2, 5]
    assert members[1] == [1, 4]
    assert members[3] == [3]
    capped = clique_members(grp, cap=2)
    assert capped[0] == [0, 2]


def test_extract_attention(rng):
    n, m = 10, 4
    att = rng.random((n, m)).astype(np.float32)
    city = Grouping.from_ids(rng.integers(0, 3, n))
    prov = Grouping.from_ids(rng.integers(0, 2, n))
    art = extract_attention(att, city, prov, top_k=2)
    # top-1 per row is the argmax
    np.testing.assert_array_equal(
        art["inter_src_top"][:, 0], att.argmax(1)
    )
    # per recipient: top source
    np.testing.assert_array_equal(
        art["inter_rec_top"][:, 0], att.T.argmax(1)
    )
    assert len(art["city_members"]) == n


def test_npz_round_trip_reconstructs_reference_argmax_sets(rng, tmp_path):
    """Round-trip oracle (VERDICT r1 item #9): simulate the reference's
    dense Record() buffers on a small graph and check that the factored
    multi-head npz reconstructs every per-row argmax set (Explainer.py:25-30
    semantics) exactly."""
    from msha_gnn_tpu.explain import reconstruct_intra_row, save_attcoeff_npz

    n, m, heads = 12, 5, 3
    att = rng.random((heads, n, m)).astype(np.float32)
    city = Grouping.from_ids(rng.integers(0, 4, n))
    prov = Grouping.from_ids(rng.integers(0, 2, n))
    cw = rng.random((heads, n)).astype(np.float32) + 0.1
    pw = rng.random((heads, n)).astype(np.float32) + 0.1

    path = str(tmp_path / "att.npz")
    save_attcoeff_npz(path, att, city, prov, city_w=cw, prov_w=pw)
    npz = np.load(path)

    # dense oracle: the reference's sequential per-head writes leave the
    # LAST head in Coeff12/Coeff3/Coeff4 (train.py:173 + 106-110)
    dense12 = att[-1]
    gid_c = np.asarray(city.group_id)
    gid_p = np.asarray(prov.group_id)
    dense3 = np.zeros((n, n), np.float32)
    dense4 = np.zeros((n, n), np.float32)
    for i in range(n):
        dense3[i, gid_c == gid_c[i]] = cw[-1, i]
        dense4[i, gid_p == gid_p[i]] = pw[-1, i]

    np.testing.assert_array_equal(npz["Coeff12"], dense12)
    np.testing.assert_array_equal(npz["Coeff12_heads"], att)  # all heads

    for i in range(n):
        # Explainer.py:25-30: per-row argmax *sets* per channel
        row3 = reconstruct_intra_row(npz, "city", i)
        row4 = reconstruct_intra_row(npz, "province", i)
        np.testing.assert_array_equal(row3, dense3[i])
        np.testing.assert_array_equal(row4, dense4[i])
        assert (set(np.argwhere(row3 == row3.max()).ravel())
                == set(np.argwhere(dense3[i] == dense3[i].max()).ravel()))
    # per-head reconstruction differs across heads where weights differ
    r_h0 = reconstruct_intra_row(npz, "city", 0, head=0)
    assert r_h0[gid_c == gid_c[0]].max() == cw[0, 0]


@pytest.mark.slow
def test_run_explain_end_to_end_multihead(tmp_path):
    """run_explain on the real 2015 data (1 short epoch): all heads land in
    the npz and the JSON exposes per-head top recipients."""
    import json as _json

    from msha_gnn_tpu.explain import run_explain

    out = str(tmp_path / "explain.json")
    npz_path = str(tmp_path / "att.npz")
    run_explain(year="2015", epochs=0, top_k=1, output=out,
                npz_path=npz_path)
    npz = np.load(npz_path)
    assert npz["Coeff12_heads"].shape[0] >= 2  # multi-head recorded
    np.testing.assert_array_equal(npz["Coeff12"], npz["Coeff12_heads"][-1])
    data = _json.loads(open(out).read())
    assert len(data["InterAttS_heads"]) == npz["Coeff12_heads"].shape[0]
    # reference-parity field uses the last head
    assert data["InterAttS"] == data["InterAttS_heads"][-1]
