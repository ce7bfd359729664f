"""The HLO collective-byte extraction behind SCALING_MODEL.json.

Grounds the multi-host scaling model (docs/parallelism.md): the parser must
find the compiled program's collectives and convert them to the analytic
per-chip wire bytes for a known partitioning.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts_scaling_model import collective_bytes, lower_bytes  # noqa: E402

from msha_gnn_tpu.bench import make_powerlaw_graph  # noqa: E402
from msha_gnn_tpu.parallel import make_mesh  # noqa: E402
from msha_gnn_tpu.parallel.dist_spmm import (  # noqa: E402
    DistributedSpmm,
    RingSpmm,
)


def test_collective_bytes_parses_shapes():
    hlo = (
        "%ag = f32[64,32]{1,0} all-gather(f32[16,32]{1,0} %x), dims={0}\n"
        "%cp = bf16[8,128]{1,0} collective-permute(bf16[8,128]{1,0} %y)\n"
    )
    ops = collective_bytes(hlo, k=4)
    kinds = {o["op"]: o for o in ops}
    assert kinds["all-gather"]["buffer_bytes"] == 64 * 32 * 4
    assert kinds["all-gather"]["wire_bytes_per_chip"] == 64 * 32 * 4 * 3 / 4
    assert kinds["collective-permute"]["wire_bytes_per_chip"] == 8 * 128 * 2


def test_collective_bytes_tuple_results():
    """ADVICE r2: tuple-result collectives (async -start pairs, variadic
    combined forms) must contribute wire bytes instead of silently
    matching nothing."""
    import pytest

    hlo = (
        # async pair: result = (input, output); wire bytes = OUTPUT only,
        # the matching -done must not double count
        "%ags = (f32[16,8]{1,0}, f32[128,8]{1,0}) all-gather-start(\n"
        "%agd = f32[128,8]{1,0} all-gather-done((f32[16,8], f32[128,8]) %ags)\n"
        # variadic combined all-reduce: sum ALL result buffers
        "%car = (bf16[64]{0}, f32[32,4]{1,0}) all-reduce(%a, %b), to_apply=add\n"
    )
    ops = collective_bytes(hlo, k=4)
    kinds = {o["op"]: o for o in ops}
    assert len(ops) == 2
    assert kinds["all-gather"]["buffer_bytes"] == 128 * 8 * 4
    assert kinds["all-reduce"]["buffer_bytes"] == 64 * 2 + 32 * 4 * 4
    # undercount fails loudly instead of inflating modelled efficiency
    with pytest.raises(ValueError):
        collective_bytes("%x = <opaque> all-to-all(%y)\n", k=2)


def test_distributed_spmm_wire_bytes_match_analytic():
    n, e, d, k = 256, 2048, 8, 2
    g, x = make_powerlaw_graph(n, n, e, d, seed=0)
    w = jnp.ones((g.num_edges,), jnp.float32)
    mesh = make_mesh(k, data_axis=k)

    dop = DistributedSpmm(g, mesh)
    ops_d, b = lower_bytes(lambda x, w: dop(x, edge_weight=w), k, x, w)
    # boundary exchange = all-gather of the dst feature rows: each chip
    # receives (k-1)/k of the padded [n_dst_pad, d] f32 buffer.  (The
    # repaired tuple-aware parser also surfaces the small all-to-alls XLA
    # inserts for the [k, E] weight redistribution, which the old regex
    # silently dropped — total wire bytes are therefore >= the all-gather.)
    n_pad = k * dop._dst_blk
    expect = n_pad * d * 4 * (k - 1) / k
    ag = sum(o["wire_bytes_per_chip"] for o in ops_d
             if o["op"] == "all-gather")
    assert ag == expect, (ag, expect)
    assert b >= expect

    rop = RingSpmm(g, mesh, runtime_weights=True)
    ops, _ = lower_bytes(lambda x, w: rop(x, edge_weight=w), k, x, w)
    names = [o["op"] for o in ops]
    assert "collective-permute" in names
    per_step = sum(o["wire_bytes_per_chip"] for o in ops
                   if o["op"] == "collective-permute")
    # each permute moves one dst shard of f32 features around the ring
    assert per_step == rop.dst_blk * d * 4
