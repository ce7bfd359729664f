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


def test_distributed_spmm_wire_bytes_match_analytic():
    n, e, d, k = 256, 2048, 8, 2
    g, x = make_powerlaw_graph(n, n, e, d, seed=0)
    w = jnp.ones((g.num_edges,), jnp.float32)
    mesh = make_mesh(k, data_axis=k)

    dop = DistributedSpmm(g, mesh)
    _, b = lower_bytes(lambda x, w: dop(x, edge_weight=w), k, x, w)
    # boundary exchange = all-gather of the dst feature rows: each chip
    # receives (k-1)/k of the padded [n_dst_pad, d] f32 buffer
    n_pad = k * dop._dst_blk
    expect = n_pad * d * 4 * (k - 1) / k
    assert b == expect, (b, expect)

    rop = RingSpmm(g, mesh, runtime_weights=True)
    ops, _ = lower_bytes(lambda x, w: rop(x, edge_weight=w), k, x, w)
    names = [o["op"] for o in ops]
    assert "collective-permute" in names
    per_step = sum(o["wire_bytes_per_chip"] for o in ops
                   if o["op"] == "collective-permute")
    # each permute moves one dst shard of f32 features around the ring
    assert per_step == rop.dst_blk * d * 4
