"""Shared transformer building blocks (Flax linen).

Param naming intentionally mirrors the HF torch module tree
(query/key/value/output.dense, intermediate.dense, layernorm_before/after)
so the torch->flax weight converters in ``compat/`` are mechanical.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention


class SelfAttention(nn.Module):
    """HF-style MHA: separate q/k/v Dense + output projection."""

    hidden_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
        b, n, _ = x.shape
        head_dim = self.hidden_size // self.num_heads
        dense = lambda name: nn.Dense(
            self.hidden_size, use_bias=self.qkv_bias, dtype=self.dtype, name=name
        )
        q = dense("query")(x).reshape(b, n, self.num_heads, head_dim)
        k = dense("key")(x).reshape(b, n, self.num_heads, head_dim)
        v = dense("value")(x).reshape(b, n, self.num_heads, head_dim)
        # Named so remat policies can save the attention output: the pallas
        # kernels' custom_vjp recomputes softmax internally from q/k/v, so
        # re-running the attention forward during a remat pass is waste.
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(
            dot_product_attention(q, k, v, bias=bias), "attn_out")
        out = out.reshape(b, n, self.hidden_size)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="out")(out)


class Mlp(nn.Module):
    hidden_size: int
    intermediate_size: int
    act: Callable = jax.nn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x)


def gelu_fast(x):
    """HF 'gelu_fast'/'gelu_new' == tanh-approximate gelu."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


class TransformerBlock(nn.Module):
    """Pre-LN ViT block (ViViT layer; vivit modeling `VivitLayer`)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    act: Callable = gelu_fast
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="layernorm_before")(x)
        x = x + SelfAttention(
            self.hidden_size, self.num_heads, dtype=self.dtype, name="attention"
        )(h, bias=bias)
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="layernorm_after")(x)
        return x + Mlp(
            self.hidden_size, self.intermediate_size, act=self.act,
            dtype=self.dtype, name="mlp",
        )(h)
