"""Multi-process (multi-host) execution over DCN.

The reference has no distributed story at all — training is a single
hardcoded ``cuda:1`` (SURVEY.md §2.4; ``resnet50-3d-video/main.py:86-88`` is
commented-out DataParallel). On TPU, scaling past one host means several
*processes*, each seeing only its local chips, with one global mesh spanning
all of them: collectives ride ICI within a slice and DCN across hosts, and
XLA inserts them from the same shardings the single-process path uses.

This module is the process-boundary glue the rest of ``parallel/`` can stay
oblivious to:

- :func:`initialize` wires ``jax.distributed.initialize`` (coordinator
  address / process count / process id, from args or ``LARYNGEAL_*`` env).
  After it returns, ``jax.devices()`` is global, so ``parallel.mesh.make_mesh``
  and every sharding built from it work unchanged.
- :func:`local_batch_slice` computes which contiguous rows of a global batch
  this process's devices own under the mesh's data axis — the data feed
  decodes only that shard (``ClipLoader(process_index=, process_count=)``).
- :func:`make_global_batch` assembles per-process local shards into one
  global jax.Array via ``jax.make_array_from_process_local_data`` (used by
  ``parallel.mesh.shard_batch`` when ``jax.process_count() > 1``).

CPU dryrun: two local processes with
``--xla_force_host_platform_device_count=N`` and gloo collectives validate
the full path without multi-host hardware (``scripts/dryrun_multiprocess.py``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

_INITIALIZED = False


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Join the multi-process runtime. Returns True if initialized.

    Arguments fall back to ``LARYNGEAL_COORDINATOR`` /
    ``LARYNGEAL_NUM_PROCESSES`` / ``LARYNGEAL_PROCESS_ID`` env vars; with
    none present this is a no-op (single-process mode) so every CLI can call
    it unconditionally. Must run before the backend initializes (i.e. before
    the first jax.devices()/jnp op in the process).

    On the CPU platform the cross-process collective implementation is set
    to gloo — XLA:CPU's in-process default cannot reach other processes.
    TPU needs nothing extra: the libtpu runtime discovers the slice topology
    from the coordinator.
    """
    global _INITIALIZED
    coordinator = coordinator or os.environ.get("LARYNGEAL_COORDINATOR")
    if num_processes is None and os.environ.get("LARYNGEAL_NUM_PROCESSES"):
        num_processes = int(os.environ["LARYNGEAL_NUM_PROCESSES"])
    if process_id is None and os.environ.get("LARYNGEAL_PROCESS_ID"):
        process_id = int(os.environ["LARYNGEAL_PROCESS_ID"])
    if not coordinator:
        return False
    if _INITIALIZED:
        return True
    platforms = (jax.config.jax_platforms or "").lower()
    if "cpu" in platforms or os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jax spells it differently; TPU path unaffected
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def local_batch_slice(mesh, global_batch: int) -> Tuple[int, int]:
    """Rows [lo, hi) of a global batch owned by this process's devices.

    Derived from the actual sharding (not assumed): a 1-D array of
    ``global_batch`` rows sharded over the mesh's data axis is mapped device
    by device; the union of this process's row ranges must be contiguous —
    true for meshes built by ``parallel.mesh.make_mesh`` (jax.devices()
    orders by process, and the (data, seq, model) reshape keeps each
    process's chips on consecutive data rows). A non-contiguous layout
    raises rather than silently feeding wrong rows.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import DATA_AXIS

    sh = NamedSharding(mesh, P(DATA_AXIS))
    idx_map = sh.addressable_devices_indices_map((global_batch,))
    ranges = sorted(
        (idx[0].start or 0, idx[0].stop if idx[0].stop is not None else global_batch)
        for idx in idx_map.values()
    )
    lo, hi = ranges[0][0], ranges[0][1]
    for s, e in ranges[1:]:
        if s > hi:
            raise ValueError(
                f"process {jax.process_index()} owns non-contiguous batch rows "
                f"{ranges} — feed this mesh with make_global_batch per-device "
                "instead of a contiguous ClipLoader shard")
        hi = max(hi, e)
    return lo, hi


def make_global_batch(sharding, local_leaf: np.ndarray, global_rows: int):
    """Local (rows/process, ...) numpy shard -> global jax.Array on `sharding`."""
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_leaf),
        (global_rows,) + tuple(local_leaf.shape[1:]))


def broadcast_string(s: str, max_len: int = 512) -> str:
    """Process 0's string to every process (e.g. the shared experiment-dir
    name — per-process timestamps would diverge)."""
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    b = (s or "").encode()[:max_len]
    buf[: len(b)] = np.frombuffer(b, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).rstrip(b"\x00").decode()


def fetch_replicated(tree):
    """Device->host fetch that works on multi-process (non-fully-addressable)
    replicated arrays: each leaf's value is identical on every device, so the
    first addressable shard IS the global value. Single-process arrays pass
    through ``jax.device_get`` unchanged."""

    def f(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_shards[0].data)
        return jax.device_get(x)

    return jax.tree_util.tree_map(f, tree)


def global_batch_rows(mesh, local_rows: int) -> int:
    """Global batch size implied by a local shard of ``local_rows`` rows."""
    from .mesh import DATA_AXIS

    n_data = mesh.shape[DATA_AXIS]
    # Unique data-axis coordinates covered by this process's devices.
    local_coords = set()
    grid = np.asarray(mesh.devices)
    it = np.ndindex(grid.shape)
    pid = jax.process_index()
    for coord in it:
        if grid[coord].process_index == pid:
            local_coords.add(coord[0])
    if not local_coords:
        raise ValueError("mesh has no devices addressable from this process")
    if local_rows * n_data % len(local_coords):
        raise ValueError(
            f"local batch {local_rows} not divisible by this process's share "
            f"of the data axis ({len(local_coords)}/{n_data})")
    return local_rows * n_data // len(local_coords)
