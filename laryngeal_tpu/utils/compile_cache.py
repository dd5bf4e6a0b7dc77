"""Persistent XLA compilation cache.

Full-size train steps take minutes to compile on a remote-compile TPU rig
(CLAUDE.md: 2-10 min through the axon relay); the reference never recompiles
because torch is eager. Enabling JAX's persistent compilation cache makes the
second process that builds the same graph skip straight to the serialized
executable (probed on this rig: compile 1.5 s -> 0.2 s on a cache hit with
identical results; the win scales with graph size).

Opt-in via ``--compile_cache_dir`` on the train/inference/serve CLIs or the
``LARYNGEAL_COMPILE_CACHE_DIR`` environment variable. Keyed by (HLO, jax
version, backend); stale entries are simply missed, never wrongly hit.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional

_log = logging.getLogger(__name__)


def enable(cache_dir: Optional[str] = None) -> Optional[str]:
    """Turn on the persistent compilation cache. Returns the directory used,
    or None when disabled (no dir given and no env var set)."""
    cache_dir = cache_dir or os.environ.get("LARYNGEAL_COMPILE_CACHE_DIR")
    if not cache_dir or str(cache_dir).lower() in ("off", "none", "0"):
        return None
    path = Path(cache_dir).expanduser()
    path.mkdir(parents=True, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", str(path))
    # Cache every compile: the default thresholds skip fast compiles, but on
    # a remote-compile relay even "fast" ones cost a round trip.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _log.info("XLA compilation cache: %s", path)
    return str(path)
