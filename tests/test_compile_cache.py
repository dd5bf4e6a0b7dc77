"""Persistent XLA compilation cache wiring (utils/compile_cache.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from laryngeal_tpu.utils.compile_cache import enable


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv("LARYNGEAL_COMPILE_CACHE_DIR", raising=False)
    assert enable(None) is None
    assert enable("off") is None
    assert enable("none") is None


def test_env_var_and_flag(tmp_path, monkeypatch):
    monkeypatch.setenv("LARYNGEAL_COMPILE_CACHE_DIR", str(tmp_path / "env"))
    try:
        assert enable(None) == str(tmp_path / "env")
        # Explicit dir wins over the env var.
        assert enable(str(tmp_path / "flag")) == str(tmp_path / "flag")

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x

        np.asarray(f(jnp.ones((64, 64), jnp.float32)))
        entries = list((tmp_path / "flag").iterdir())
        assert entries, "compile produced no cache entries"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
