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
    size is sharded; small or indivisible leaves replicate. (The pure-FSDP
    special case of :func:`_compose_fsdp_spec` — one rule, two layouts.)"""
    return NamedSharding(mesh, _compose_fsdp_spec(
        P(), shape, mesh.shape[axis], min_elems, axis))


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


def _compose_fsdp_spec(tp_spec: P, shape, n_data: int,
                       min_elems: int, axis: str = DATA_AXIS) -> P:
    """Extend a TP PartitionSpec with a 'data' shard on the largest
    still-free dimension (ZeRO-3 within each model shard). Leaves the spec
    unchanged when no free dimension divides or the leaf is small."""
    if n_data <= 1 or int(np.prod(shape or (1,))) < min_elems:
        return tp_spec
    spec = list(tp_spec) + [None] * (len(shape) - len(tp_spec))
    free = [i for i, (d, s) in enumerate(zip(shape, spec))
            if s is None and d % n_data == 0]
    if not free:
        return tp_spec
    dim = max(free, key=lambda i: shape[i])
    spec[dim] = axis
    return P(*spec)


def shard_train_state_fsdp_tp(state, mesh: Mesh, axis: str = DATA_AXIS,
                              min_elems: int = MIN_SHARD_ELEMS):
    """FSDP x TP composition: every param (and mirrored Adam-moment) leaf
    carries its Megatron model-axis spec (parallel/tp.py) PLUS a 'data'
    shard on its largest remaining dimension — the standard large-scale
    2-D layout (ZeRO-3 within each tensor-parallel group). GSPMD places
    the all-gathers/reduce-scatters on both axes; the jitted step must be
    built with ``tp=True`` so the layout propagates instead of being
    forced back to replicated."""
    from .tp import param_partition_specs

    n_data = mesh.shape[axis]
    specs = param_partition_specs(state.params, mesh)
    rep = NamedSharding(mesh, P())

    def put(tree):
        return jax.tree.map(
            lambda v, s: jax.device_put(
                v, NamedSharding(mesh, _compose_fsdp_spec(
                    s, getattr(v, "shape", ()), n_data, min_elems, axis))),
            tree, specs)

    def fix_opt(node):
        if hasattr(node, "mu") and hasattr(node, "nu"):
            kw = {"mu": put(node.mu), "nu": put(node.nu)}
            if hasattr(node, "count"):
                kw["count"] = jax.device_put(node.count, rep)
            return node._replace(**kw)
        return node

    new_opt = jax.tree.map(
        fix_opt, state.opt_state,
        is_leaf=lambda n: hasattr(n, "mu") and hasattr(n, "nu"))
    return state.replace(
        params=put(state.params),
        opt_state=new_opt,
        batch_stats=jax.device_put(state.batch_stats, rep)
        if state.batch_stats else state.batch_stats,
        step=jax.device_put(state.step, rep),
    )
