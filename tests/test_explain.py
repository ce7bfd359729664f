"""Explainer artefacts from factored attention."""

import numpy as np
import jax.numpy as jnp

from msha_gnn_tpu.explain import clique_members, extract_attention
from msha_gnn_tpu.graph import Grouping


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
