"""Bit-exact PIL (Pillow) 8-bit bilinear resampling, jittable.

The HF image processors the reference trains through resize via PIL —
``VivitImageProcessor`` / ``AutoImageProcessor`` inside the trainer
(``/root/reference/vivit_transformer/vivit_classifier/trainers/
trainer.py:22-26``) convert each frame to a PIL image and call
``Image.resize(..., Resampling.BILINEAR)``. Pillow's 8-bit path is NOT the
float separable bilinear ``jax.image`` computes:

- coefficients are fixed-point: ``int(0.5 + w * 2^22)`` (PRECISION_BITS =
  32 - 8 - 2), normalized in double *before* quantization;
- the resample is two passes (horizontal, then vertical) with the
  intermediate CLIPPED BACK TO uint8 between passes
  (``clip8((ss + 2^21) >> 22)``);
- the filter support scales with the downscale factor (antialias always on;
  for upscale the support stays 1, i.e. plain triangle).

Those three details are the ~1e-2 pixel-level "PIL-vs-jax tolerance floor"
the whole-loop ViViT A/B carried (AB_REPORT.md). This module reproduces
Pillow's ``ImagingResampleHorizontal_8bpc`` / ``..Vertical_8bpc`` exactly
(coefficient generation mirrors ``src/libImaging/Resample.c
precompute_coeffs`` / ``normalize_coeffs_8bpc``): integer matmuls against
precomputed dense coefficient matrices, uint8 clip between passes. Opt in
via ``LARYNGEAL_PIL_EXACT=1`` (read by preprocess.transforms at trace
time); the fused float gather stays the default compute path.

Verified bit-exact against real Pillow in tests/test_pil_resize.py across
sizes, aspect ratios, and up/down-scales.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

PRECISION_BITS = 32 - 8 - 2  # Pillow Resample.c


@lru_cache(maxsize=128)
def _pil_coeffs(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) int32 fixed-point bilinear coefficients,
    exactly Pillow's precompute_coeffs + normalize_coeffs_8bpc for the
    triangle (BILINEAR) filter."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # bilinear support = 1.0
    ss = 1.0 / filterscale
    k = np.zeros((out_size, in_size), np.int32)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = int(center - support + 0.5)
        if xmin < 0:
            xmin = 0
        xmax = int(center + support + 0.5)
        if xmax > in_size:
            xmax = in_size
        n = xmax - xmin
        w = np.empty(n, np.float64)
        for x in range(n):
            arg = (x + xmin - center + 0.5) * ss
            w[x] = (1.0 - abs(arg)) if abs(arg) < 1.0 else 0.0
        tot = w.sum()
        if tot != 0.0:
            w /= tot
        for x in range(n):
            v = w[x] * (1 << PRECISION_BITS)
            k[xx, xmin + x] = np.int32(int(v - 0.5) if v < 0 else int(v + 0.5))
    return k


def _clip8(ss: jnp.ndarray) -> jnp.ndarray:
    """Pillow clip8: (ss >> 22) clamped to [0, 255] (ss carries +2^21)."""
    return jnp.clip(ss >> PRECISION_BITS, 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def pil_resize_bilinear_u8(img_u8: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(..., H, W, C) uint8 -> (..., out_h, out_w, C) uint8, bit-exact
    Pillow BILINEAR. Horizontal pass first, uint8 intermediate, then
    vertical — Pillow's ImagingResample order."""
    h, w = img_u8.shape[-3], img_u8.shape[-2]
    kx = jnp.asarray(_pil_coeffs(w, out_w))  # (out_w, w)
    ky = jnp.asarray(_pil_coeffs(h, out_h))  # (out_h, h)
    half = jnp.int32(1 << (PRECISION_BITS - 1))

    x = img_u8.astype(jnp.int32)
    # Horizontal: contract the W axis.
    ss = jnp.einsum("...hwc,ow->...hoc", x, kx,
                    preferred_element_type=jnp.int32) + half
    tmp = _clip8(ss).astype(jnp.int32)
    # Vertical: contract the H axis of the clipped intermediate.
    ss = jnp.einsum("...hwc,oh->...owc", tmp, ky,
                    preferred_element_type=jnp.int32) + half
    return _clip8(ss)


def hf_shortest_edge_size(h: int, w: int, size: int) -> tuple:
    """transformers.get_resize_output_image_size(default_to_square=False):
    shortest edge -> ``size``, long edge floor-scaled."""
    short, long = (h, w) if h <= w else (w, h)
    new_short, new_long = size, int(size * long / short)
    return (new_short, new_long) if h <= w else (new_long, new_short)


def hf_resize_center_crop_u8(video_u8: jnp.ndarray, size: int,
                             crop: int) -> jnp.ndarray:
    """(T, H, W, C) uint8 -> (T, crop, crop, C) uint8 with the HF
    processor's exact geometry: PIL-bilinear shortest-edge resize to
    ``size`` then integer center crop (transformers.image_transforms.
    center_crop: top = (new_h - crop) // 2)."""
    t, h, w, c = video_u8.shape
    new_h, new_w = hf_shortest_edge_size(h, w, size)
    if new_h < crop or new_w < crop:
        raise ValueError(
            f"resized {new_h}x{new_w} smaller than crop {crop} — the HF "
            f"pad-then-crop branch is not implemented (not reachable at the "
            f"reference geometries)")
    resized = pil_resize_bilinear_u8(video_u8, new_h, new_w)
    top = (new_h - crop) // 2
    left = (new_w - crop) // 2
    return resized[:, top:top + crop, left:left + crop, :]
