"""Fully-sharded data parallelism (ZeRO-3 style) over the 'data' axis.

The reference is single-GPU (SURVEY.md §2.4); plain dp here replicates
params and optimizer state on every device, so per-device memory does not
fall as the mesh grows. This module shards every large parameter leaf —
and, because the decision is purely shape-based, the Adam moments that
mirror it — along one dimension over the SAME 'data' axis the batch is
sharded on. That is the ZeRO-3/FSDP memory layout, expressed the TPU-native
way: no wrapper modules, no hand-written gather/scatter — leaves carry
NamedShardings and XLA's SPMD partitioner inserts the all-gather before
each use and reduce-scatters the gradients (the standard JAX FSDP idiom;
"How to Scale Your Model" ch. 5's recipe of sharding + letting the
compiler place collectives).

Numerics: identical to replicated dp up to float reassociation — the same
gradient all-reduce happens, just scattered; pinned against replicated
training in tests/test_fsdp.py.

When to use: models at these sizes (<=88 M params) replicate comfortably,
so this is off by default; `--fsdp` turns it on for memory-bound
configurations (long clips + remat already trades FLOPs for HBM; fsdp
frees 2x param+moment bytes per doubling of the data axis).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

# Leaves smaller than this stay replicated: LayerNorm scales, biases, BN
# stats — sharding them saves nothing and adds collective latency.
MIN_SHARD_ELEMS = 2 ** 16


def fsdp_leaf_sharding(mesh: Mesh, shape, axis: str = DATA_AXIS,
                       min_elems: int = MIN_SHARD_ELEMS) -> NamedSharding:
    """Sharding for one leaf: the largest dimension divisible by the axis
    size is sharded; small or indivisible leaves replicate."""
    n = mesh.shape[axis]
    if n <= 1 or int(np.prod(shape or (1,))) < min_elems:
        return NamedSharding(mesh, P())
    divisible = [i for i, d in enumerate(shape) if d % n == 0]
    if not divisible:
        return NamedSharding(mesh, P())
    dim = max(divisible, key=lambda i: shape[i])
    spec = [None] * len(shape)
    spec[dim] = axis
    return NamedSharding(mesh, P(*spec))


def shard_train_state_fsdp(state, mesh: Mesh, axis: str = DATA_AXIS,
                           min_elems: int = MIN_SHARD_ELEMS):
    """device_put every leaf of a TrainState with its FSDP sharding.

    Purely shape-driven, so the optimizer moment trees (which mirror the
    param shapes) land on the same layout as their params, and scalars
    (step, Adam count, injected lr) replicate. Use with the tp-style step
    factories (`make_train_step(..., tp=True)`) so the shardings propagate
    through the jitted step instead of being forced back to replicated.
    """
    def put(x):
        shape = getattr(x, "shape", ())
        return jax.device_put(x, fsdp_leaf_sharding(mesh, shape, axis,
                                                    min_elems))

    return jax.tree.map(put, state)
