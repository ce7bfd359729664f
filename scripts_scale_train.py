#!/usr/bin/env python
"""BASELINE config #5 training demo: sparse-GAT link predictor on a 50M+
edge synthetic power-law graph.

Two topologies (VERDICT r1 item #4):
  * single chip, out-of-core — ``training.scale.train_chunked``
    (ChunkedSpmm runtime-weight custom VJP; the [E, d] gathered
    intermediates stream in balanced slices)
  * 8-device virtual mesh, edge-partitioned — ``train_distributed``
    (DistributedSpmm under shard_map; run with JAX_PLATFORMS=cpu
    XLA_FLAGS=--xla_force_host_platform_device_count=8)

Usage:
  python scripts_scale_train.py chunked [edges_millions] [steps]
  python scripts_scale_train.py profile [edges_millions]   # r5: phase
      breakdown of the chunked training step (VERDICT r4 #5)
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts_scale_train.py distributed [edges_millions] [steps]

Prints one JSON line with the loss trajectory and edges/s.
"""
import json
import sys
import time

import numpy as np


def build_edges(n_nodes: int, n_edges: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    t0 = time.time()
    src = np.sort(rng.integers(0, n_nodes, n_edges).astype(np.int32))
    p = 1.0 / np.arange(1, n_nodes + 1) ** 1.5
    cdf = np.cumsum(p / p.sum())
    dst = np.minimum(
        np.searchsorted(cdf, rng.random(n_edges)), n_nodes - 1
    ).astype(np.int32)
    print(f"edge set built in {time.time()-t0:.1f}s", file=sys.stderr)
    return src, dst


def profile_chunked(src, dst, n_nodes, cfg):
    """Phase breakdown of the 50M-edge chunked training step (VERDICT r4
    #5: 4.5 s/step vs ~0.76 s of in-core kernel time — name the gap).

    Each phase is its own hoisted+jitted program at FULL edge count,
    timed with a dependency chain; the full hoisted step is timed the
    same way so phases and step share one methodology."""
    import jax
    import jax.numpy as jnp
    import optax

    from msha_gnn_tpu.bench import _timeit_chain
    from msha_gnn_tpu.ops.chunked import ChunkedSpmm
    from msha_gnn_tpu.ops.pallas.softmax import SegmentSoftmaxOperator
    from msha_gnn_tpu.training.scale import (_init_params, _make_loss)
    from msha_gnn_tpu.utils.hoist import hoist_closure

    t0 = time.time()
    s = np.ascontiguousarray(src, np.int32)
    r = np.ascontiguousarray(dst, np.int32)
    order = np.argsort(s, kind="stable")
    s, r = s[order], r[order]
    e = len(s)
    num_slices = max(1, int(np.ceil(e * cfg.d * 4 / (512 * 2**20))))
    op = ChunkedSpmm.from_host_coo(s, r, None, n_src=n_nodes,
                                   n_dst=n_nodes, num_slices=num_slices,
                                   assume_sorted=True)
    cnt = np.bincount(s, minlength=n_nodes)
    row_ptr = np.concatenate([[0], np.cumsum(cnt)])
    sm = SegmentSoftmaxOperator(s, row_ptr, n_nodes)
    rcv_dev = jnp.asarray(r)
    print(f"[profile] layout {time.time()-t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(5)
    d = cfg.d
    sv = jnp.asarray(rng.standard_normal(n_nodes).astype(np.float32))
    dv = jnp.asarray(rng.standard_normal(n_nodes).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((n_nodes, d)).astype(np.float32))
    ct_n = jnp.asarray(rng.standard_normal((n_nodes, d)).astype(np.float32))
    l_e = jnp.asarray(rng.standard_normal(e).astype(np.float32))
    ct_e = jnp.asarray(rng.standard_normal(e).astype(np.float32))
    out = {"edges": e, "n_nodes": n_nodes, "d": d,
           "num_slices": num_slices}

    def timed(name, fn, *args, iters=10):
        # hoist AND keep the consts as jit ARGUMENTS all the way into the
        # chained scan — wrapping the hoisted callable in a closure and
        # re-jitting (bench._timeit_chain) re-embeds them as constants
        # and the 50M schedules blow the remote-compile payload again
        conv, consts = hoist_closure(fn, *args)
        consts = tuple(jnp.asarray(c) for c in consts)

        @jax.jit
        def run(x0, rest, consts):
            def step(c, _):
                o = conv(consts, x0 + c * 1e-12, *rest)
                leaf = jax.tree_util.tree_leaves(o)[0].reshape(-1)
                return ((leaf[0] + leaf[-1]).astype(jnp.float32)
                        + c * 0.5, None)
            c, _ = jax.lax.scan(step, jnp.float32(0.0), None,
                                length=iters)
            return c

        float(run(args[0], args[1:], consts))
        t1 = time.perf_counter()
        float(run(args[0], args[1:], consts))
        t = (time.perf_counter() - t1) / iters
        out[name] = t
        print(f"[profile] {name}: {t*1e3:.0f} ms  "
              f"t={time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    # 1. rank-1 logits: sorted row-broadcast sender term + [E] scalar
    #    take of the receiver term (fwd, then fwd+grad).  Tie b to the
    #    perturbed a — otherwise the receiver take is loop-invariant and
    #    XLA hoists it out of the timing scan (the biggest cost of this
    #    phase would go unmeasured).
    def logits(a, b):
        b = b + a[0] * 1e-30
        return jax.nn.leaky_relu(
            sm.broadcast_rows(a) + jnp.take(b, rcv_dev), 0.2)

    timed("logits_fwd", logits, sv, dv)
    timed("logits_fwd_grad",
          lambda a, b: jax.grad(
              lambda a, b: jnp.vdot(logits(a, b), ct_e),
              argnums=(0, 1))(a, b), sv, dv)

    # 2. segment softmax at [E]
    timed("softmax_fwd", lambda l: sm(l), l_e)
    timed("softmax_fwd_grad",
          lambda l: jax.grad(lambda l: jnp.vdot(sm(l), ct_e))(l), l_e)

    # 3. chunked weighted aggregation (fwd, fwd+grad)
    att = jnp.asarray(rng.random(e).astype(np.float32))
    timed("chunked_spmm_fwd", lambda hh, a: op.apply(hh, a), h, att)
    timed("chunked_spmm_fwd_grad",
          lambda hh, a: jax.grad(
              lambda hh, a: jnp.vdot(op.apply(hh, a), ct_n),
              argnums=(0, 1))(hh, a), h, att)

    # 4. tail: link scores + BCE + adam on the feature table
    params = _init_params(jax.random.key(0), n_nodes, d)
    tx = optax.adam(cfg.lr)
    opt0 = tx.init(params)
    rng_b = np.random.default_rng(11)
    batch = tuple(jnp.asarray(rng_b.integers(0, n_nodes, cfg.batch_edges)
                              .astype(np.int32)) for _ in range(4))

    def tail(z):
        pos = jnp.sum(z[batch[0]] * z[batch[1]], axis=1)
        neg = jnp.sum(z[batch[2]] * z[batch[3]], axis=1)
        return (optax.sigmoid_binary_cross_entropy(
                    pos, jnp.ones_like(pos)).mean()
                + optax.sigmoid_binary_cross_entropy(
                    neg, jnp.zeros_like(neg)).mean())

    timed("tail_fwd_grad", lambda z: jax.grad(tail)(z), h)

    def adam_only(feat):
        p = dict(params, feat=feat)
        upd, _ = tx.update(jax.tree_util.tree_map(jnp.ones_like, p), opt0)
        return optax.apply_updates(p, upd)["feat"]

    timed("adam_update", adam_only, params["feat"])

    # 5. the full training step, hoisted exactly as train_chunked builds it
    loss_fn = _make_loss(jnp.asarray(s), rcv_dev, n_nodes,
                         lambda hh, a: op.apply(hh, a), cfg, softmax=sm)
    zi = jnp.zeros(cfg.batch_edges, jnp.int32)

    def step(params, ps, pr, ns, nr):
        loss, grads = jax.value_and_grad(loss_fn)(params, ps, pr, ns, nr)
        upd, _ = tx.update(grads, opt0)
        return optax.apply_updates(params, upd)["feat"] + loss

    conv, consts = hoist_closure(step, params, zi, zi, zi, zi)
    consts = tuple(jnp.asarray(c) for c in consts)
    feat0 = params["feat"]

    @jax.jit
    def run_step(feat, consts):
        def body(c, _):
            p = dict(params, feat=feat + c * 1e-12)
            o = conv(consts, p, zi, zi, zi, zi)
            leaf = o.reshape(-1)
            return (leaf[0] + leaf[-1]).astype(jnp.float32) + c * 0.5, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=4)
        return c

    float(run_step(feat0, consts))
    t1 = time.perf_counter()
    float(run_step(feat0, consts))
    out["step_full"] = (time.perf_counter() - t1) / 4
    print(f"[profile] step_full: {out['step_full']*1e3:.0f} ms",
          file=sys.stderr, flush=True)

    ksum = (out["logits_fwd_grad"] + out["softmax_fwd_grad"]
            + out["chunked_spmm_fwd_grad"] + out["tail_fwd_grad"]
            + out["adam_update"])
    out["component_sum"] = ksum
    out["step_over_component_sum"] = out["step_full"] / ksum
    out["edges_per_s_step"] = e / out["step_full"]
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "chunked"
    edges_m = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_nodes = int(sys.argv[4]) if len(sys.argv) > 4 else 2_000_000

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize prepends its TPU platform regardless of
        # the env var; restrict explicitly so the virtual mesh is real
        jax.config.update("jax_platforms", "cpu")

    from msha_gnn_tpu.training.scale import (ScaleConfig, train_chunked,
                                             train_distributed)

    n_edges = edges_m * 1_000_000
    src, dst = build_edges(n_nodes, n_edges)
    cfg = ScaleConfig(d=32, steps=steps, batch_edges=8192)

    def log(rec):
        print(json.dumps(rec), file=sys.stderr, flush=True)

    t0 = time.time()
    if mode == "profile":
        res = profile_chunked(src, dst, n_nodes, cfg)
        res.update(mode=mode, wall=round(time.time() - t0, 1))
        print(json.dumps(res))
        with open("SCALE_STEP_PROFILE.json", "w") as f:
            json.dump(res, f, indent=2)
        return
    if mode == "chunked":
        res = train_chunked(src, dst, n_nodes, cfg, log=log)
    else:
        from msha_gnn_tpu.parallel import make_mesh

        k = len(jax.devices())
        res = train_distributed(src, dst, n_nodes, make_mesh(k, data_axis=k),
                                cfg, log=log)
    res.update(mode=mode, edges=n_edges, n_nodes=n_nodes, d=cfg.d,
               wall=round(time.time() - t0, 1),
               platform=jax.devices()[0].platform)
    res["loss_history"] = [round(v, 5) for v in res["loss_history"]]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
