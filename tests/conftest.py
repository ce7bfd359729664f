"""Test harness config.

Runs the whole suite on a virtual 8-device CPU mesh so multi-chip sharding is
exercised without TPU hardware (SURVEY §4: forced-host-device emulation).
Must set the env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize prepends its TPU platform regardless of the env var;
# force-restrict to cpu so tests never compile over the device tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_random_bipartite(rng, n_src=23, n_dst=7, density=0.3, pad_to_multiple=16):
    """Random small bipartite graph with integer counts (like flow counts)."""
    from msha_gnn_tpu.graph import BipartiteGraph

    dense = (rng.random((n_src, n_dst)) < density) * rng.integers(
        1, 5, (n_src, n_dst)
    )
    dense = dense.astype(np.float32)
    return BipartiteGraph.from_dense(dense, pad_to_multiple=pad_to_multiple), dense


@pytest.fixture
def random_bipartite(rng):
    return make_random_bipartite(rng)
