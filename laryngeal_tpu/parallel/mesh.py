"""Device mesh + sharding definitions.

The reference has NO distributed support (single hardcoded ``cuda:1``,
SURVEY.md §2.4). This module is its TPU-native replacement: a ``Mesh`` over
('data', 'model') axes; batches shard on 'data', parameters replicate (the
largest backbone here is Swin3D-B at ~88M params, so model-axis sharding is
defined but defaults to size 1). Gradient all-reduce happens implicitly over
ICI — GSPMD inserts the psum when a jitted step consumes a data-sharded batch
with replicated params.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              n_seq: int = 1, devices=None) -> Mesh:
    """Mesh over (data, seq, model). Defaults to all devices on the data axis.

    The 'seq' axis carries sequence (context) parallelism — token-axis
    activation sharding (parallel/sp.py); 'model' carries Megatron tensor
    parallelism (parallel/tp.py). Axis order puts 'model' innermost so TP's
    per-block all-reduces ride adjacent-chip ICI links on a real slice, with
    'seq' next (all-gather of k/v once per attention) and 'data' outermost
    (one gradient all-reduce per step). PartitionSpecs that name only 'data'
    or 'model' work unchanged on the 3-axis mesh (unnamed axes replicate).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq)
    if n_data * n_model * n_seq > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_seq}x{n_model} needs "
            f"{n_data * n_model * n_seq} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_seq * n_model]).reshape(
        n_data, n_seq, n_model)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def auto_mesh(batch_size: int, devices=None) -> Optional[Mesh]:
    """Largest data-parallel mesh whose size divides `batch_size`.

    Returns None when only one device would be used (single-chip path)."""
    devices = list(devices if devices is not None else jax.devices())
    n = 1
    for d in range(min(batch_size, len(devices)), 0, -1):
        if batch_size % d == 0:
            n = d
            break
    if n <= 1:
        return None
    return make_mesh(n_data=n, devices=devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """device_put array leaves of a host batch with batch-dim sharding.

    The batch dimension must divide the data-axis size; use
    ``ClipLoader(pad_last=True)`` with a mesh-multiple batch size.

    Multi-process: when ``jax.process_count() > 1`` each process passes its
    LOCAL shard of the batch (rows per ``distributed.local_batch_slice``) and
    the leaves are assembled into one global jax.Array spanning the whole
    mesh via ``jax.make_array_from_process_local_data`` — the host never
    materializes the global batch anywhere.
    """
    sharding = batch_sharding(mesh)
    multiproc = jax.process_count() > 1
    if multiproc:
        from .distributed import global_batch_rows, make_global_batch

        rows_cache = {}

        def _put_leaf(a: np.ndarray):
            g = rows_cache.get(a.shape[0])
            if g is None:
                g = rows_cache[a.shape[0]] = global_batch_rows(mesh, a.shape[0])
            return make_global_batch(sharding, a, g)

    else:
        _put_leaf = lambda a: jax.device_put(a, sharding)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = _put_leaf(v)
        elif (isinstance(v, tuple) and v
              and all(isinstance(a, np.ndarray) for a in v)):
            # Wire-format payloads (e.g. the dct wire's (dc, ac) tuple) are
            # pytrees of batch-leading arrays; one sharding covers all leaves.
            out[k] = tuple(_put_leaf(a) for a in v)
        else:
            out[k] = v
    return out


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh.

    Multi-process: every process holds the same host values (deterministic
    same-seed init); each leaf becomes a global replicated jax.Array built
    from per-device copies on the addressable devices only.
    """
    sharding = replicated_sharding(mesh)
    if jax.process_count() <= 1:
        return jax.device_put(tree, sharding)

    local = [d for d in mesh.devices.flat
             if d.process_index == jax.process_index()]

    def _rep(x):
        x = np.asarray(x)
        shards = [jax.device_put(x, d) for d in local]
        return jax.make_array_from_single_device_arrays(x.shape, sharding, shards)

    return jax.tree_util.tree_map(_rep, tree)


def shard_map_nocheck(fn, mesh: Mesh, in_specs, out_specs):
    """`shard_map` with replication checking off, across jax versions.

    jax >= 0.8 promotes shard_map out of jax.experimental and renames
    check_rep -> check_vma; this is the one place that difference lives
    (used by parallel/sp.py and parallel/pp.py — keep them in sync by
    keeping them here).
    """
    if hasattr(jax, "shard_map"):
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    from jax.experimental.shard_map import shard_map as _sm  # pragma: no cover

    return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)
