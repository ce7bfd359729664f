"""Raw-data anonymisation pipeline: round-trips into the shipped schema."""

import numpy as np
import pytest

from msha_gnn_tpu.data.raw import (
    RawRecord,
    anonymize,
    classify_major,
    write_anonymous_dataset,
)


def _records():
    rows = [
        # province, city, county, gender, major, family_status, school_prov
        ("P1", "C1", "K1", "F", "math(applied)", "poor", "S1"),
        ("P1", "C1", "K1", "F", "math(applied)", "poor", "S2"),  # same node
        ("P1", "C2", "K2", "M", "biology", "ok", "S1"),
        ("P2", "C3", "K3", "F", "weird??", "ok", "S2"),  # unclassifiable
        ("P2", "C3", "K4", "M", "history", "ok", "S1"),
    ]
    return [RawRecord(*r) for r in rows]


MAJOR_TABLE = {"ma": "science", "bi": "science", "hi": "humanities"}


def test_classify_major():
    assert classify_major("math(applied)", MAJOR_TABLE) == "science"
    assert classify_major("history", MAJOR_TABLE) == "humanities"
    assert classify_major("??x", MAJOR_TABLE) is None
    assert classify_major("zz", MAJOR_TABLE, {"zz": "arts"}) == "arts"
    assert classify_major("zz", MAJOR_TABLE) is None


def test_anonymize_structure():
    out = anonymize(_records(), {"K1": 100.0, "K2": 300.0},
                    major_table=MAJOR_TABLE)
    # the unclassifiable row is dropped; 3 unique nodes remain
    assert len(out["source_index"]) == 3
    assert set(out["recipient_index"]) == {"S1", "S2"}
    assert out["flows"].shape == (4, 4)
    # GDP min-max normalised with fallback for K4
    vals = list(out["gdp_embedding"].values())
    assert min(vals) == 0.0 and max(vals) == 1.0
    # same node (rows 0, 1) share a source id
    assert out["flows"][0, 0] == out["flows"][1, 0]


def test_roundtrip_through_flow_loader(tmp_path):
    from msha_gnn_tpu.data import load_flow_graph

    out = anonymize(_records(), {"K1": 100.0, "K2": 300.0},
                    major_table=MAJOR_TABLE)
    write_anonymous_dataset(str(tmp_path), "2099", out)
    fg = load_flow_graph("2099", str(tmp_path), pad_to_multiple=8)
    assert fg.n_src == 3
    assert fg.n_dst == 2
    assert fg.num_records == 4
    assert fg.city.num_groups == 3
    assert fg.province.num_groups == 2


def test_from_scipy(rng):
    import scipy.sparse as sp

    from msha_gnn_tpu.graph import from_scipy

    dense = (rng.random((12, 7)) < 0.4).astype(np.float32)
    g = from_scipy(sp.csr_matrix(dense), pad_to_multiple=8)
    np.testing.assert_allclose(np.asarray(g.to_dense()), dense)


def test_shipped_major_table():
    """The reference's 721-entry more_major dict ships as a package asset
    (VERDICT r1 item #7) and classify_major resolves through it exactly as
    dataset.py:380-390 does."""
    from msha_gnn_tpu.data import (classify_major, derive_prefix_table,
                                   load_major_table)

    overrides = load_major_table()
    assert len(overrides) == 721
    disciplines = set(overrides.values())
    assert len(disciplines) == 12  # the 12 first-level disciplines
    assert "工学" in disciplines  # 工学

    table = derive_prefix_table(overrides)
    assert len(table) > 300
    # prefix hit takes priority (reference: try major[m_] first)
    name, disc = next(iter(overrides.items()))
    if name[:2] in table:
        assert classify_major(name, table, overrides) == table[name[:2]]
    # override fallback: an entry whose prefix is ambiguous
    amb = [n for n in overrides if n[:2] not in table]
    assert amb, "expected ambiguous prefixes"
    assert classify_major(amb[0], table, overrides) == overrides[amb[0]]
    # star marker + parenthesised suffix are stripped
    assert (classify_major("★" + amb[0] + "(test)", table, overrides)
            == overrides[amb[0]])
    # unclassifiable
    assert classify_major("??unknown", table, overrides) is None
