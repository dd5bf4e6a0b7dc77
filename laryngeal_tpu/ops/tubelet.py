"""Tubelet embedding — patch-matmul formulations of the ViViT stem.

A conv3d with kernel == stride == tubelet (2,16,16) is exactly a gather of
non-overlapping patches followed by one (N, 1536) x (1536, D) matmul. Three
interchangeable implementations:

- ``conv``:   XLA conv3d (what models/vivit.py uses by default);
- ``matmul``: explicit reshape/transpose -> single jnp.dot — XLA lowers this
  straight onto the MXU with zero im2col overhead;
- ``pallas``: the same matmul as a Pallas kernel with (128,512)x(512,128)
  VMEM tiles — demonstrates the kernel pattern and serves shapes where the
  XLA schedule is suboptimal.

All take channels-last video (B, T, H, W, C) and the Flax conv kernel layout
(kt, kh, kw, C, D) + bias (D,), so they are drop-in for the 'projection'
params of VivitEmbeddings. Parity is tested to 1e-4; on v5e the matmul and
conv forms are within noise of each other for ViViT-B (the op is ~2% of
end-to-end time), so the default stays ``conv`` and the alternatives are
selectable via ``LARYNGEAL_TUBELET_IMPL``.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    _VMEM = None


def extract_tubelets(video: jax.Array, tubelet: Tuple[int, int, int]) -> jax.Array:
    """(B,T,H,W,C) -> (B, N, kt*kh*kw*C) patch matrix, token order t-major
    then h then w (matching HF flatten(2) and models/vivit.py)."""
    b, t, h, w, c = video.shape
    kt, kh, kw = tubelet
    x = video.reshape(b, t // kt, kt, h // kh, kh, w // kw, kw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (B, T', H', W', kt, kh, kw, C)
    return x.reshape(b, (t // kt) * (h // kh) * (w // kw), kt * kh * kw * c)


def flatten_kernel(kernel: jax.Array) -> jax.Array:
    """Flax conv kernel (kt,kh,kw,C,D) -> matmul weight (kt*kh*kw*C, D)."""
    kt, kh, kw, c, d = kernel.shape
    return kernel.reshape(kt * kh * kw * c, d)


def tubelet_embed_matmul(video, kernel, bias, tubelet=(2, 16, 16)):
    patches = extract_tubelets(video, tubelet)
    w = flatten_kernel(kernel).astype(patches.dtype)
    out = jnp.dot(patches, w, preferred_element_type=jnp.float32)
    return (out + bias.astype(jnp.float32)).astype(video.dtype)


def tubelet_embed_conv(video, kernel, bias, tubelet=(2, 16, 16)):
    out = jax.lax.conv_general_dilated(
        video, kernel.astype(video.dtype), window_strides=tubelet, padding="VALID",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )
    b = video.shape[0]
    out = out + bias.astype(out.dtype)
    return out.reshape(b, -1, kernel.shape[-1])


def _matmul_kernel(x_ref, w_ref, b_ref, o_ref):
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (acc + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def tubelet_embed_pallas(video, kernel, bias, tubelet=(2, 16, 16),
                         block_n: int = 256, interpret=None):
    """Pallas tiled matmul over the patch matrix (K kept whole in VMEM:
    1536 x D fits easily)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    patches = extract_tubelets(video, tubelet)
    w = flatten_kernel(kernel).astype(patches.dtype)
    b, n, k = patches.shape
    d = w.shape[1]
    x2 = patches.reshape(b * n, k)
    m = x2.shape[0]
    m_pad = -(-m // block_n) * block_n
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    mem = dict(memory_space=_VMEM) if (_VMEM is not None and not interpret) else {}
    out = pl.pallas_call(
        _matmul_kernel,
        grid=(m_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, k), lambda i: (i, 0), **mem),
            pl.BlockSpec((k, d), lambda i: (0, 0), **mem),
            pl.BlockSpec((d,), lambda i: (0,), **mem),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda i: (i, 0), **mem),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), video.dtype),
        interpret=interpret,
    )(x2, w, bias.astype(video.dtype))
    return out[:m].reshape(b, n, d)


IMPLS = {
    "conv": tubelet_embed_conv,
    "matmul": tubelet_embed_matmul,
    "pallas": tubelet_embed_pallas,
}


def tubelet_embed(video, kernel, bias, tubelet=(2, 16, 16), impl=None):
    impl = impl or os.environ.get("LARYNGEAL_TUBELET_IMPL", "conv")
    if impl not in IMPLS:
        raise ValueError(f"Unknown tubelet impl {impl!r}")
    return IMPLS[impl](video, kernel, bias, tubelet)
