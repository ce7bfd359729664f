"""Closure-constant hoisting for tunnel-friendly compilation.

A jitted function that *closes over* large device arrays (operator
schedule buffers, edge lists) gets those arrays embedded in the lowered
HLO module as literal constants.  On a remoted runtime (the axon TPU
tunnel compiles over HTTP) the serialized module then exceeds the
transport's request limit — the 50M-edge out-of-core training step
closes over ~4 GB of visit schedules and dies with ``HTTP 413`` at its
first compile.  Locally-attached chips merely pay module bloat and
cache-key churn.

``jax.closure_convert`` does not help: it hoists only *perturbed*
(differentiated-through) float consts and deliberately leaves everything
else — including the int32 schedule arrays that are the bulk here — as
embedded constants.

:func:`hoist_closure` hoists **all** jaxpr constants: it traces the
function once (host-side, no compile), splits the closed jaxpr into
(jaxpr, consts), and returns an equivalent function taking the consts as
its first argument.  Passing that tuple through ``jax.jit`` turns every
closed-over array into a runtime parameter of the executable.  The
returned function stays differentiable — custom_vjp/pallas calls inside
survive as jaxpr equations and keep their AD rules.

No reference analog (the reference is a single-process CUDA script,
``/root/reference/train.py:212-215``); this is runtime machinery the
TPU build needs for remoted compilation.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
from jax.tree_util import tree_flatten, tree_unflatten

__all__ = ["hoist_closure"]


def _eval_jaxpr(jaxpr, consts, *args):
    # jax 0.9 removed other jax.core re-exports (see spmm.py's
    # _trace_state_clean); guard this one the same way so the next jax
    # bump degrades loudly at import of the private home, not silently.
    try:
        return jax.core.eval_jaxpr(jaxpr, consts, *args)
    except AttributeError:
        pass
    from jax._src.core import eval_jaxpr
    return eval_jaxpr(jaxpr, consts, *args)


def hoist_closure(fn: Callable, *example_args: Any
                  ) -> Tuple[Callable, Tuple]:
    """Trace ``fn`` at ``example_args`` and hoist its closure constants.

    Returns ``(converted, consts)`` where
    ``converted(consts, *args) == fn(*args)`` for any ``args`` matching
    the example's pytree structure and shapes/dtypes.  ``consts`` is a
    flat tuple of every array ``fn`` closed over; pass it through the
    surrounding ``jit`` so the arrays become executable parameters
    rather than embedded HLO constants.

    The trace is shape-specialized: like ``jit``, ``converted`` is only
    valid for arguments with the example's structure, shapes and dtypes.
    """
    flat_ex, in_tree = tree_flatten(example_args)
    store = {}

    def flat_fn(*flat_args):
        args = tree_unflatten(in_tree, flat_args)
        out = fn(*args)
        out_flat, out_tree = tree_flatten(out)
        store["out_tree"] = out_tree
        return out_flat

    closed = jax.make_jaxpr(flat_fn)(*flat_ex)
    consts = tuple(closed.consts)
    jaxpr = closed.jaxpr
    out_tree = store["out_tree"]

    # consts bind to jaxpr.constvars; invars are exactly the call args
    arg_avals = jaxpr.invars

    def converted(consts, *args):
        flat_args, in_tree2 = tree_flatten(args)
        if in_tree2 != in_tree:
            raise TypeError(
                "hoist_closure: argument structure changed since trace: "
                f"expected {in_tree}, got {in_tree2}"
            )
        # shape/dtype check against the traced avals: a same-structure
        # call with different shapes would otherwise fail deep inside
        # eval_jaxpr (or silently broadcast in shape-polymorphic ops)
        for i, (a, v) in enumerate(zip(flat_args, arg_avals)):
            aval = v.aval
            shape = getattr(a, "shape", ())
            dtype = getattr(a, "dtype", None)
            if tuple(shape) != tuple(aval.shape) or (
                dtype is not None and dtype != aval.dtype
            ):
                raise TypeError(
                    f"hoist_closure: flat arg {i} has shape/dtype "
                    f"{tuple(shape)}/{dtype}, but the trace expects "
                    f"{tuple(aval.shape)}/{aval.dtype}"
                )
        out_flat = _eval_jaxpr(jaxpr, list(consts), *flat_args)
        return tree_unflatten(out_tree, out_flat)

    return converted, consts
