"""Tensor (model-axis) parallelism — param partition specs for transformers.

The backbones here fit on one chip (<=88M params), so TP is not required for
capacity; it exists so the same mesh scales the framework beyond these models
(SURVEY.md §2.4: leave a 'model' axis available). Megatron-style layout:

- attention q/k/v kernels: shard the *output* (head) dim -> P(None, 'model');
- attention output kernel: shard the *input* dim -> P('model', None);
- MLP fc1: shard output; fc2: shard input (one all-reduce per block,
  inserted automatically by GSPMD when the jitted step consumes these
  shardings);
- biases follow their kernel's output sharding; everything else replicates.

Applies to the ViViT/TimeSformer param trees (layers.SelfAttention /
FusedQKVAttention / Mlp naming) and composes with data parallelism on the
same mesh.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (path-suffix, PartitionSpec) — first match wins; paths are flax param paths.
_RULES: Tuple = (
    (("attention", "query", "kernel"), P(None, MODEL_AXIS)),
    (("attention", "key", "kernel"), P(None, MODEL_AXIS)),
    (("attention", "value", "kernel"), P(None, MODEL_AXIS)),
    (("attention", "qkv", "kernel"), P(None, MODEL_AXIS)),
    (("temporal_attention", "qkv", "kernel"), P(None, MODEL_AXIS)),
    (("attention", "query", "bias"), P(MODEL_AXIS)),
    (("attention", "key", "bias"), P(MODEL_AXIS)),
    (("attention", "value", "bias"), P(MODEL_AXIS)),
    (("attention", "qkv", "bias"), P(MODEL_AXIS)),
    (("temporal_attention", "qkv", "bias"), P(MODEL_AXIS)),
    (("attention", "out", "kernel"), P(MODEL_AXIS, None)),
    (("temporal_attention", "out", "kernel"), P(MODEL_AXIS, None)),
    (("mlp", "fc1", "kernel"), P(None, MODEL_AXIS)),
    (("mlp", "fc1", "bias"), P(MODEL_AXIS)),
    (("mlp", "fc2", "kernel"), P(MODEL_AXIS, None)),
    (("mlp_fc1", "kernel"), P(None, MODEL_AXIS)),
    (("mlp_fc1", "bias"), P(MODEL_AXIS)),
    (("mlp_fc2", "kernel"), P(MODEL_AXIS, None)),
    # TimeSformer's per-block temporal projection (models/timesformer.py:96):
    # a square Dense between two replicated activations — column-shard it
    # (GSPMD all-gathers before the residual add). Shards the memory; the
    # round-2 VERDICT flagged it as "most likely to silently replicate".
    (("temporal_dense", "kernel"), P(None, MODEL_AXIS)),
    (("temporal_dense", "bias"), P(MODEL_AXIS)),
    # Swin3D windowed attention (models/swin3d.py:130-157): same Megatron
    # column/row split on the fused qkv and output projection. The rel-pos
    # bias table is per-head (axis 1) — sharded only when num_heads divides
    # the model axis (tiny stage 1 has 3 heads -> replicates, by the
    # divisibility guard in _spec_for).
    (("attn", "qkv", "kernel"), P(None, MODEL_AXIS)),
    (("attn", "qkv", "bias"), P(MODEL_AXIS)),
    (("attn", "proj", "kernel"), P(MODEL_AXIS, None)),
    (("attn", "relative_position_bias_table"), P(None, MODEL_AXIS)),
    # PatchMerging reduction (4C -> 2C, bias-free): column-shard.
    (("reduction", "kernel"), P(None, MODEL_AXIS)),
)


def _spec_for(path: Tuple[str, ...], value, mesh: Mesh) -> P:
    n_model = mesh.shape[MODEL_AXIS]
    for suffix, spec in _RULES:
        if path[-len(suffix):] == suffix:
            # Only shard when the dimension divides evenly.
            dims = [d for d in spec if d is not None]
            if not dims:
                return spec
            axis_positions = [i for i, d in enumerate(spec) if d is not None]
            ok = all(value.shape[i] % n_model == 0 for i in axis_positions
                     if i < value.ndim)
            if ok:
                return spec
            return P()
    return P()


def param_partition_specs(params, mesh: Mesh):
    """Pytree of PartitionSpec mirroring `params` (Megatron TP layout)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    specs = {k: _spec_for(k, v, mesh) for k, v in flat.items()}
    return flax.traverse_util.unflatten_dict(specs)


def shard_params(params, mesh: Mesh):
    """device_put params with TP shardings over `mesh`."""
    specs = param_partition_specs(params, mesh)
    return jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: hasattr(x, "shape"),
    )


def shard_train_state(state, mesh: Mesh):
    """Shard a TrainState: params + matching optimizer moments (adam mu/nu)
    on the model axis, everything else replicated. Data-parallel replication
    across the 'data' axis is implicit (specs never mention it)."""
    specs = param_partition_specs(state.params, mesh)
    rep = NamedSharding(mesh, P())

    def put(tree):
        return jax.tree.map(
            lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), tree, specs)

    def fix_opt(node):
        if hasattr(node, "mu") and hasattr(node, "nu"):
            kw = {"mu": put(node.mu), "nu": put(node.nu)}
            if hasattr(node, "count"):
                kw["count"] = jax.device_put(node.count, rep)
            return node._replace(**kw)
        return node

    new_opt = jax.tree.map(
        fix_opt, state.opt_state,
        is_leaf=lambda n: hasattr(n, "mu") and hasattr(n, "nu"),
    )
    return state.replace(
        params=put(state.params),
        opt_state=new_opt,
        batch_stats=jax.device_put(state.batch_stats, rep)
        if state.batch_stats else state.batch_stats,
        step=jax.device_put(state.step, rep),
    )
