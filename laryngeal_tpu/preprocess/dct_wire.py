"""DCT wire format — transform-coded host->device clip transport.

Why this exists: the end-to-end pipeline is transfer-bound on
bandwidth-limited host->device links (BENCH_r02: transfer 60% of the serial
budget at ~35 MB/s), and the link moves payloads with long byte runs
dramatically faster (it content-compresses — measured: an all-zeros payload
moves >200x faster than random bytes, while the lossless temporal-delta
wire's modest entropy reduction bought only +4%). Quantized DCT coefficient
planes are mostly *runs of zeros* — exactly the structure such links reward.

Format (per clip, I420 geometry h x w, h/w multiples of 16):
  dc : int16 (T, NB)        DC coefficients (exceed int8 range)
  ac : int8  (K, T, NB)     AC planes in ZIGZAG frequency order,
                            coefficient-major so zeros of one frequency are
                            contiguous across blocks+frames; K <= 63 — the
                            trailing (highest-frequency) planes may be
                            truncated entirely (JPEG-progressive style),
                            halving the payload at quality<=80 where they
                            are almost all zeros anyway
  NB = (h/8)*(w/8) + 2*(h/16)*(w/16)   (Y blocks, then U, then V)

Encoding is JPEG-style (8x8 DCT-II, Annex-K tables scaled by `quality`,
round-half-even) but the entropy coding is delegated to the link itself —
the payload stays a dense array a single `device_put` ships, and the exact
inverse (dequantize -> IDCT as ONE (64,64) matmul -> chroma expansion) runs
jitted on the device and fuses into the decode->logits graph.

Loss is bounded and measured (tests/test_dct_wire.py pins PSNR and model
probability drift); the lossless `delta` wire remains available and the
quality knob trades bytes for fidelity. Host encode: native C++
(native/cliploader.cpp::clip_dct_encode) with this module's numpy
implementation as the exact-match fallback/reference.

No reference counterpart (the reference is single-host; SURVEY.md §2.4) —
this is TPU-native infrastructure for feeding chips over slow links (DCN,
relay tunnels, remote storage).
"""

from __future__ import annotations

import logging
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_QUALITY = 87
DEFAULT_KEEP_AC = 63

# JPEG zigzag scan: ZIGZAG[i] = row-major index of the i-th coefficient in
# frequency order (ZIGZAG[0] == 0 is the DC).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int32)

# JPEG Annex K base tables (quality 50).
JPEG_LUMA_Q50 = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.float32).reshape(8, 8)
JPEG_CHROMA_Q50 = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.float32).reshape(8, 8)


def quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: floor((base*scale+50)/100), clamped to [1,255].
    Must match native/cliploader.cpp::quant_recip bit-for-bit."""
    q = int(quality)
    if not 1 <= q <= 100:
        raise ValueError(f"quality must be in [1,100], got {quality}")
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    t = np.floor((base * scale + 50.0) / 100.0)
    return np.clip(t, 1.0, 255.0).astype(np.float32)


@lru_cache(maxsize=None)
def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II matrix C (8,8): coeffs = C @ x @ C.T."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c = (c * np.sqrt(2.0 / 8)).astype(np.float32)
    c[0] *= np.float32(1.0 / np.sqrt(2.0))
    return c


@lru_cache(maxsize=None)
def _idct_kron() -> np.ndarray:
    """(64,64) M with pixels_flat = coeffs_flat @ M (row-major 8x8 flatten).

    x = C^T Y C  =>  x[u,v] = sum_{a,b} C[a,u] Y[a,b] C[b,v]
                 =>  M[(a,b),(u,v)] = C[a,u] * C[b,v] = kron(C, C)[(a,b),(u,v)]
    One (nblocks,64)@(64,64) matmul replaces per-block 8x8 matmuls — the
    MXU-friendly formulation (full 64-lane contraction vs 8)."""
    c = _dct_matrix()
    return np.kron(c, c).astype(np.float32)


def block_geometry(h: int, w: int) -> Tuple[int, int, int]:
    """(nb_luma, nb_chroma, nb_total) 8x8 block counts for I420 h x w."""
    if h % 16 or w % 16:
        raise ValueError(f"DCT wire needs h, w multiples of 16, got {h}x{w}")
    nby = (h // 8) * (w // 8)
    nbc = (h // 16) * (w // 16)
    return nby, nbc, nby + 2 * nbc


@lru_cache(maxsize=None)
def _dequant_scales(h: int, w: int, quality: int) -> np.ndarray:
    """(64, NB) per-block dequantization scales (luma vs chroma tables)."""
    nby, nbc, nb = block_geometry(h, w)
    qy = quant_table(JPEG_LUMA_Q50, quality).reshape(64)
    qc = quant_table(JPEG_CHROMA_Q50, quality).reshape(64)
    scales = np.empty((64, nb), np.float32)
    scales[:, :nby] = qy[:, None]
    scales[:, nby:] = qc[:, None]
    return scales


# ---------------------------------------------------------------------------
# Host encode (numpy reference; native C++ fast path in data/native.py).
# ---------------------------------------------------------------------------

def _blockify(plane: np.ndarray) -> np.ndarray:
    """(T, H, W) -> (T, (H/8)*(W/8), 64) row-major 8x8 blocks."""
    t, h, w = plane.shape
    return (plane.reshape(t, h // 8, 8, w // 8, 8)
            .transpose(0, 1, 3, 2, 4).reshape(t, -1, 64))


def encode_clip_np(i420: np.ndarray, quality: int = DEFAULT_QUALITY,
                   keep_ac: int = DEFAULT_KEEP_AC):
    """uint8 I420 clip (T, H*3/2, W) -> (dc int16 (T,NB),
    ac int8 (keep_ac,T,NB) in zigzag order).

    Exact reference for the native encoder (same tables, same round-half-
    even); vectorized across frames+blocks via the (64,64) kron matmul."""
    t, h15, w = i420.shape
    h = h15 * 2 // 3
    nby, nbc, nb = block_geometry(h, w)
    y = i420[:, :h, :]
    u = i420[:, h:h + h // 4, :].reshape(t, h // 2, w // 2)
    v = i420[:, h + h // 4:, :].reshape(t, h // 2, w // 2)
    blocks = np.concatenate(
        [_blockify(y), _blockify(u), _blockify(v)], axis=1
    ).astype(np.float32) - 128.0                      # (T, NB, 64)
    # Forward transform: M maps coeffs->pixels, and kron(C,C) is orthogonal,
    # so pixels @ M.T recovers the coefficients.
    coeffs = blocks @ _idct_kron().T
    # Multiply by the f32 reciprocal (not divide) to match the native
    # encoder's arithmetic before the round.
    recip = np.float32(1.0) / _dequant_scales(h, w, quality)  # (64, NB)
    q = coeffs * recip.T[None]                        # (T, NB, 64)
    q = np.rint(q)                                    # round-half-even
    dc = q[..., 0].astype(np.int16)                   # (T, NB)
    ac = np.clip(q[..., ZIGZAG[1:keep_ac + 1]], -128, 127).astype(np.int8)
    return dc, np.ascontiguousarray(ac.transpose(2, 0, 1))


# Packed-wire default: plane statistics on real bench clips at quality 75
# (BASELINE.md round-3 packed-wire study) show zigzag planes >= 14 are almost
# entirely within the signed-4-bit range [-8, 7] (worst clamp fraction 2e-4),
# so nibble-packing them halves their bytes at negligible extra loss. The
# relay link hashes/compresses *raw* payload bytes on the single host core —
# raw bytes, not information content, are what the packed wire removes.
DEFAULT_PACK_FROM = 14


def pack_ac_planes(ac: np.ndarray, pack_from: int = DEFAULT_PACK_FROM):
    """Split AC planes (K, T, NB) int8 into (ac_hi (P,T,NB) int8,
    ac_pk (ceil((K-P)/2), T, NB) uint8) — planes >= ``pack_from`` clamped to
    [-8, 7] and nibble-packed pairwise (even plane -> low nibble). An odd
    trailing plane pairs with an implicit zero plane."""
    k = ac.shape[0]
    p = max(0, min(int(pack_from), k))
    hi8 = np.ascontiguousarray(ac[:p])
    rest = ac[p:]
    if rest.shape[0] == 0:
        return hi8, np.zeros((0,) + ac.shape[1:], np.uint8)
    from ..data import native

    npairs = (rest.shape[0] + 1) // 2
    if native.available() and hasattr(native, "ac_pack"):
        return hi8, native.ac_pack(rest)
    rest = np.clip(rest.astype(np.int16), -8, 7)
    if rest.shape[0] % 2:
        rest = np.concatenate(
            [rest, np.zeros((1,) + rest.shape[1:], np.int16)])
    packed = (rest[0::2] & 15) | ((rest[1::2] & 15) << 4)
    assert packed.shape[0] == npairs
    return hi8, packed.astype(np.uint8)


def unpack_ac_planes(ac_hi: np.ndarray, ac_pk: np.ndarray,
                     k_total: int) -> np.ndarray:
    """Host inverse of :func:`pack_ac_planes` (tests/reference)."""
    x = ac_pk.astype(np.int16)
    lo = ((x & 15) ^ 8) - 8
    hi = (((x >> 4) & 15) ^ 8) - 8
    inter = np.stack([lo, hi], axis=1).reshape(
        (2 * ac_pk.shape[0],) + ac_pk.shape[1:])
    n_packed = k_total - ac_hi.shape[0]
    return np.concatenate(
        [ac_hi.astype(np.int16), inter[:n_packed]]).astype(np.int8)


def encode_clip_packed(i420: np.ndarray, quality: int = DEFAULT_QUALITY,
                       keep_ac: int = DEFAULT_KEEP_AC,
                       pack_from: int = DEFAULT_PACK_FROM):
    """Like :func:`encode_clip` but returns the packed wire triple
    (dc int16 (T,NB), ac_hi int8 (P,T,NB), ac_pk uint8 (Q,T,NB))."""
    dc, ac = encode_clip(i420, quality, keep_ac)
    ac_hi, ac_pk = pack_ac_planes(ac, pack_from)
    return dc, ac_hi, ac_pk


_NATIVE_ENCODE_WARNED = False


def encode_clip(i420: np.ndarray, quality: int = DEFAULT_QUALITY,
                keep_ac: int = DEFAULT_KEEP_AC):
    """Native C++ encode when available, numpy fallback (matching to +-1 on
    a <2e-3 fraction of coefficients — float accumulation order)."""
    from ..data import native

    if native.available() and hasattr(native, "dct_encode"):
        try:
            return native.dct_encode(i420, quality, keep_ac)
        except Exception as e:
            # Log ONCE: a broken native encoder silently falling back to the
            # ~10x slower numpy path on every clip would quietly erase the
            # wire-throughput win with nothing pointing at why.
            global _NATIVE_ENCODE_WARNED
            if not _NATIVE_ENCODE_WARNED:
                _NATIVE_ENCODE_WARNED = True
                logging.getLogger(__name__).warning(
                    "native clip_dct_encode failed (%s) — falling back to "
                    "the numpy encoder (~10x slower per clip); rebuild "
                    "native/ (make -C native) to restore it", e)
    return encode_clip_np(i420, quality, keep_ac)


# ---------------------------------------------------------------------------
# Device decode (jittable, fuses into the decode->logits graph).
# ---------------------------------------------------------------------------

def _unblockify(blocks: jax.Array, h: int, w: int) -> jax.Array:
    """(T, nblocks, 64) -> (T, H, W)."""
    t = blocks.shape[0]
    return (blocks.reshape(t, h // 8, w // 8, 8, 8)
            .transpose(0, 1, 3, 2, 4).reshape(t, h, w))


@partial(jax.jit, static_argnames=("h", "w", "quality"))
def decode_to_rgb(dc: jax.Array, ac: jax.Array, h: int, w: int,
                  quality: int = DEFAULT_QUALITY) -> jax.Array:
    """(dc (T,NB) int16, ac (K,T,NB) int8 zigzag) -> RGB f32 (T,H,W,3), 0-255.

    Dequant -> IDCT (one (T*NB,64)@(64,64) matmul) -> plane reassembly ->
    BT.601 chroma expansion (same math as transforms.yuv420_to_rgb). The
    integer round/clip reproduces the host-side uint8 reconstruction exactly;
    truncated planes (K < 63) decode as zero coefficients."""
    nby, nbc, nb = block_geometry(h, w)
    t, k = dc.shape[0], ac.shape[0]
    coeffs = jnp.zeros((64, t, nb), jnp.float32)
    coeffs = coeffs.at[0].set(dc.astype(jnp.float32))
    coeffs = coeffs.at[jnp.asarray(ZIGZAG[1:k + 1])].set(
        ac.astype(jnp.float32))
    return _coeffs_to_rgb(coeffs, h, w, quality)


@partial(jax.jit, static_argnames=("h", "w", "quality", "k_total"))
def decode_to_rgb_packed(dc: jax.Array, ac_hi: jax.Array, ac_pk: jax.Array,
                         h: int, w: int, quality: int = DEFAULT_QUALITY,
                         k_total: int = DEFAULT_KEEP_AC) -> jax.Array:
    """Packed-wire inverse of :func:`encode_clip_packed`: the first
    ``ac_hi.shape[0]`` zigzag AC planes arrive int8, the remaining
    ``k_total - P`` planes arrive nibble-packed pairwise in ``ac_pk`` uint8
    (even plane -> low nibble, two's-complement signed 4-bit). The unpack is
    three elementwise int ops that fuse into the decode graph — the wire
    saves raw host->device bytes, the device pays ~nothing."""
    nby, nbc, nb = block_geometry(h, w)
    t = dc.shape[0]
    p = ac_hi.shape[0]
    coeffs = jnp.zeros((64, t, nb), jnp.float32)
    coeffs = coeffs.at[0].set(dc.astype(jnp.float32))
    if p:
        coeffs = coeffs.at[jnp.asarray(ZIGZAG[1:p + 1])].set(
            ac_hi.astype(jnp.float32))
    n_packed = k_total - p
    if n_packed:
        x = ac_pk.astype(jnp.int32)
        lo = ((x & 15) ^ 8) - 8           # signed 4-bit, low nibble
        hi = (((x >> 4) & 15) ^ 8) - 8    # signed 4-bit, high nibble
        inter = jnp.stack([lo, hi], axis=1).reshape(
            (2 * ac_pk.shape[0], t, nb))[:n_packed]
        coeffs = coeffs.at[jnp.asarray(ZIGZAG[p + 1:k_total + 1])].set(
            inter.astype(jnp.float32))
    return _coeffs_to_rgb(coeffs, h, w, quality)


def _coeffs_to_rgb(coeffs: jax.Array, h: int, w: int,
                   quality: int) -> jax.Array:
    """Shared tail: dequant -> one (T*NB,64)@(64,64) IDCT matmul -> plane
    reassembly -> BT.601 chroma expansion."""
    nby, nbc, nb = block_geometry(h, w)
    scales = jnp.asarray(_dequant_scales(h, w, quality))      # (64, NB)
    coeffs = coeffs * scales[:, None, :]                      # (64, T, NB)
    pixels = jnp.einsum("ctn,cd->tnd", coeffs, jnp.asarray(_idct_kron()),
                        preferred_element_type=jnp.float32) + 128.0
    pixels = jnp.clip(jnp.round(pixels), 0.0, 255.0)          # == uint8 recon
    y = _unblockify(pixels[:, :nby], h, w)
    u = _unblockify(pixels[:, nby:nby + nbc], h // 2, w // 2)
    v = _unblockify(pixels[:, nby + nbc:], h // 2, w // 2)
    return _yuv_planes_to_rgb(y, u, v)


def _yuv_planes_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Shared BT.601 conversion — single source of truth in
    transforms.yuv_planes_to_rgb (lazy import: transforms lazily imports
    this module for the dct wire, so a top-level import would be fragile)."""
    from .transforms import yuv_planes_to_rgb

    return yuv_planes_to_rgb(y, u, v)


def decode_clip_np(dc: np.ndarray, ac: np.ndarray, h: int, w: int,
                   quality: int = DEFAULT_QUALITY) -> np.ndarray:
    """Host reference inverse -> uint8 I420 (T, H*3/2, W) (for tests/PSNR)."""
    nby, nbc, nb = block_geometry(h, w)
    t, k = dc.shape[0], ac.shape[0]
    coeffs = np.zeros((64, t, nb), np.float32)
    coeffs[0] = dc.astype(np.float32)
    coeffs[ZIGZAG[1:k + 1]] = ac.astype(np.float32)
    coeffs *= _dequant_scales(h, w, quality)[:, None, :]
    pixels = np.einsum("ctn,cd->tnd", coeffs, _idct_kron()) + 128.0
    pixels = np.clip(np.rint(pixels), 0, 255).astype(np.uint8)

    def unb(blocks, ph, pw):
        return (blocks.reshape(t, ph // 8, pw // 8, 8, 8)
                .transpose(0, 1, 3, 2, 4).reshape(t, ph, pw))

    out = np.empty((t, h * 3 // 2, w), np.uint8)
    out[:, :h] = unb(pixels[:, :nby], h, w)
    out[:, h:h + h // 4] = unb(pixels[:, nby:nby + nbc],
                               h // 2, w // 2).reshape(t, h // 4, w)
    out[:, h + h // 4:] = unb(pixels[:, nby + nbc:],
                              h // 2, w // 2).reshape(t, h // 4, w)
    return out
