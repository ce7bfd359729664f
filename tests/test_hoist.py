"""Closure-constant hoisting (utils/hoist.py).

The 50M-edge out-of-core training step closes over GBs of visit
schedules; embedded as HLO constants they exceed the remoted runtime's
compile-payload limit (observed: HTTP 413 from the axon tunnel).
``hoist_closure`` lifts every closed-over array into an explicit
argument.  These tests pin (a) numerical parity incl. gradients through
custom_vjp operators, (b) that the constants really leave the lowered
module, and (c) that ``ChunkedSpmm`` stays trace-safe when first used
inside a trace (the r3 softmax-cache regression class).
"""

import jax
import jax.numpy as jnp
import numpy as np

from msha_gnn_tpu.utils.hoist import hoist_closure


def test_hoist_parity_and_consts():
    big = jnp.asarray(np.random.default_rng(0).normal(size=(64, 32)),
                      dtype=jnp.float32)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 64, 128),
                      dtype=jnp.int32)

    def fn(x):
        return jnp.tanh(big[idx] @ x).sum()

    x = jnp.ones((32, 8))
    converted, consts = hoist_closure(fn, x)
    assert len(consts) >= 2  # big + idx at minimum
    np.testing.assert_allclose(converted(consts, x), fn(x), rtol=1e-6)

    # gradients flow through the converted function
    g_ref = jax.grad(fn)(x)
    g_conv = jax.grad(lambda x: converted(consts, x))(x)
    np.testing.assert_allclose(g_conv, g_ref, rtol=1e-6)

    # the closed-over arrays become PARAMETERS of the jitted module, not
    # embedded constants: every const's total size appears in the
    # argument signature
    jitted = jax.jit(lambda consts, x: converted(consts, x))
    text = jitted.lower(consts, x).as_text()
    n_params = text.count("%arg") or text.count("arg0")
    assert n_params >= 1
    # 64*32 floats embedded would show up as a dense<...> literal blob
    assert "dense<[[" not in text.replace("dense<[[0", "")


def test_hoist_through_custom_vjp_operator():
    """Parity + grad through ChunkedSpmm (custom_vjp + pallas interpret)."""
    rng = np.random.default_rng(2)
    n, e, d = 96, 700, 8
    src = np.sort(rng.integers(0, n, e).astype(np.int32))
    dst = rng.integers(0, n, e).astype(np.int32)

    from msha_gnn_tpu.ops.chunked import ChunkedSpmm

    op = ChunkedSpmm.from_host_coo(src, dst, None, n_src=n, n_dst=n,
                                   num_slices=2, assume_sorted=True)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    w = jnp.asarray(rng.random(e), jnp.float32)

    def fn(x, w):
        return (op.apply(x, w) ** 2).sum()

    converted, consts = hoist_closure(fn, x, w)
    np.testing.assert_allclose(converted(consts, x, w), fn(x, w),
                               rtol=1e-5)
    gx_ref, gw_ref = jax.grad(fn, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(lambda x, w: converted(consts, x, w),
                      argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx, gx_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gw, gw_ref, rtol=1e-5, atol=1e-6)


def test_chunked_spmm_first_use_under_trace_then_eager():
    """ChunkedSpmm first exercised inside a trace must not cache tracers:
    a later eager call and a SECOND independent trace both still work
    (regression: _ensure_stacked cached jnp.stack tracers)."""
    rng = np.random.default_rng(3)
    n, e, d = 64, 300, 4
    src = np.sort(rng.integers(0, n, e).astype(np.int32))
    dst = rng.integers(0, n, e).astype(np.int32)

    from msha_gnn_tpu.ops.chunked import ChunkedSpmm

    op = ChunkedSpmm.from_host_coo(src, dst, None, n_src=n, n_dst=n,
                                   num_slices=2, assume_sorted=True)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    w = jnp.asarray(rng.random(e), jnp.float32)

    @jax.jit
    def f1(x, w):
        return op.apply(x, w)

    @jax.jit
    def f2(x, w):
        return op.apply(x, w) * 2.0

    a = f1(x, w)            # first use: under trace
    b = op.apply(x, w)      # eager
    c = f2(x, w)            # second, distinct trace
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c, 2.0 * np.asarray(a), rtol=1e-5,
                               atol=1e-6)


def test_train_chunked_hoisted_matches_unhoisted():
    rng = np.random.default_rng(4)
    n, e = 200, 1500
    src = np.sort(rng.integers(0, n, e).astype(np.int32))
    dst = rng.integers(0, n, e).astype(np.int32)

    from msha_gnn_tpu.training import scale as S

    cfg = S.ScaleConfig(d=8, steps=2, batch_edges=32)
    r_hoist = S.train_chunked(src, dst, n, cfg, num_slices=2)

    # re-run through the unhoisted step path
    orig = S._train

    def unhoisted(*a, **k):
        k["hoist"] = False
        return orig(*a, **k)

    S._train = unhoisted
    try:
        r_plain = S.train_chunked(src, dst, n, cfg, num_slices=2)
    finally:
        S._train = orig
    np.testing.assert_allclose(r_hoist["loss_history"],
                               r_plain["loss_history"], rtol=1e-5)


def test_trace_state_probe_works_on_this_jax():
    """jax 0.9 removed jax.core.trace_state_clean; the helper must still
    distinguish eager from traced (an always-False probe silently
    disables every eager device-commit cache in the kernel stack)."""
    from msha_gnn_tpu.ops.pallas.spmm import _trace_state_clean

    assert _trace_state_clean() is True
    seen = {}

    @jax.jit
    def f(x):
        seen["in_trace"] = _trace_state_clean()
        return x

    f(jnp.ones(2))
    assert seen["in_trace"] is False
    assert _trace_state_clean() is True
