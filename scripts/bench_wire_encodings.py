"""Wire-encoding study: compressibility + actual relay h2d bandwidth.

The headline e2e metric is transfer-bound (BENCH_r02: transfer 60% of the
serial budget), and the relay moves low-entropy payloads faster (it
content-compresses; BASELINE.md round-3 wire A/B). The lossless temporal
delta is the shipping default (+4% median). This script asks the next
question: how much faster do *structurally sparser* encodings move, and at
what reconstruction cost?

Arms (all built from real decoded bench clips, I420 224^2 x 32f):
  raw        I420 planes                                  (lossless)
  delta      mod-256 temporal delta (shipping default)    (lossless)
  dpcm-tN    dead-zone DPCM, quantizer in loop, |d|<=N->0 (max err N)
  dct-qQ     JPEG-style 8x8 DCT + Annex-K quant at quality Q,
             coefficient-plane-major int16 layout          (lossy, PSNR'd)
  zeros      all-zero payload (relay compression ceiling)

Outputs one line per arm: raw MB, zlib-1/-6 ratio (host-side proxy for the
relay compressor), measured effective h2d MB/s on the chip (fresh payloads,
d2h-fetch barrier, latency-corrected like bench.bench_transfer), and for
lossy arms the max |err| and PSNR of the reconstructed I420 bytes.

Run:  PYTHONPATH=/root/.axon_site:. python scripts/bench_wire_encodings.py
      [--no-tpu]  (compressibility only)
"""

from __future__ import annotations

import argparse
import sys
import time
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NUM_FRAMES = 32
CROP = 224
BATCH = 8

# JPEG Annex K base tables (quality 50).
JPEG_LUMA_Q50 = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)
JPEG_CHROMA_Q50 = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float32)


def quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    q = max(1, min(100, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    t = np.floor((base * scale + 50) / 100)
    return np.clip(t, 1, 255).astype(np.float32)


def dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2 / 8)
    c[0] *= 1 / np.sqrt(2)
    return c.astype(np.float32)  # (8,8), X_dct = C @ x @ C.T


C8 = dct_matrix()


def blockify(plane: np.ndarray) -> np.ndarray:
    """(H,W) -> (nby*nbx, 8, 8)."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h, w))


def dct_encode_clip(i420: np.ndarray, quality: int):
    """(T, H*3/2, W) uint8 -> (coeffs int16 (64, T, NB), tables) lossy."""
    t, h15, w = i420.shape
    h = h15 * 2 // 3
    qy = quant_table(JPEG_LUMA_Q50, quality)
    qc = quant_table(JPEG_CHROMA_Q50, quality)
    out = []
    for ti in range(t):
        y = i420[ti, :h, :].astype(np.float32) - 128.0
        u = i420[ti, h:h + h // 4, :].reshape(h // 2, w // 2).astype(np.float32) - 128.0
        v = i420[ti, h + h // 4:, :].reshape(h // 2, w // 2).astype(np.float32) - 128.0
        frames = []
        for plane, q in ((y, qy), (u, qc), (v, qc)):
            b = blockify(plane)                       # (n,8,8)
            coef = C8 @ b @ C8.T                      # batched
            coef = np.rint(coef / q).astype(np.int16)
            frames.append(coef.reshape(coef.shape[0], 64))
        out.append(np.concatenate(frames, axis=0))    # (NB, 64)
    coeffs = np.stack(out)                             # (T, NB, 64)
    return np.ascontiguousarray(coeffs.transpose(2, 0, 1))  # (64, T, NB)


def dct_decode_clip(coeffs: np.ndarray, h: int, w: int, quality: int) -> np.ndarray:
    """Inverse of dct_encode_clip -> (T, H*3/2, W) uint8."""
    qy = quant_table(JPEG_LUMA_Q50, quality)
    qc = quant_table(JPEG_CHROMA_Q50, quality)
    _, t, nb = coeffs.shape
    nby = (h // 8) * (w // 8)
    nbc = (h // 16) * (w // 16)
    out = np.empty((t, h * 3 // 2, w), np.uint8)
    for ti in range(t):
        fr = coeffs[:, ti, :].T.reshape(nb, 8, 8).astype(np.float32)
        planes = []
        for sl, q, (ph, pw) in ((slice(0, nby), qy, (h, w)),
                                (slice(nby, nby + nbc), qc, (h // 2, w // 2)),
                                (slice(nby + nbc, None), qc, (h // 2, w // 2))):
            b = fr[sl] * q
            pix = C8.T @ b @ C8 + 128.0
            planes.append(np.clip(np.rint(pix), 0, 255).astype(np.uint8))
        y, u, v = planes
        out[ti, :h] = unblockify(y, h, w)
        out[ti, h:h + h // 4] = unblockify(u, h // 2, w // 2).reshape(h // 4, w)
        out[ti, h + h // 4:] = unblockify(v, h // 2, w // 2).reshape(h // 4, w)
    return out


def dpcm_encode(clip: np.ndarray, tol: int):
    """Dead-zone temporal DPCM, quantizer in loop, mod-256 wraparound:
    |residual| <= tol -> 0, else ship the full residual as a wrapping uint8
    delta (decode is the SAME uint8 cumsum as the lossless delta wire).
    Error strictly bounded by tol — no clamping, no drift."""
    t = clip.shape[0]
    out = np.empty_like(clip)
    out[0] = clip[0]
    recon = clip[0].copy()
    for ti in range(1, t):
        d = clip[ti].astype(np.int16) - recon.astype(np.int16)
        dq = np.where(np.abs(d) <= tol, 0, d).astype(np.int16)
        recon = (recon.astype(np.int16) + dq).astype(np.uint8)  # mod 256
        out[ti] = dq.astype(np.uint8)  # wraps mod 256
    return out, None


def dpcm_decode(enc: np.ndarray) -> np.ndarray:
    return np.cumsum(enc.astype(np.uint8), axis=0, dtype=np.uint8)


def pack_dct_int8(coeffs: np.ndarray):
    """(64, T, NB) int16 -> (dc int16 (T,NB), ac int8 (63,T,NB) clamped).
    AC clamps are rare at q>=75 and bounded by the already-lossy quant."""
    dc = coeffs[0].astype(np.int16)
    ac = np.clip(coeffs[1:], -128, 127).astype(np.int8)
    return dc, ac


def unpack_dct_int8(dc: np.ndarray, ac: np.ndarray) -> np.ndarray:
    return np.concatenate([dc[None].astype(np.int16),
                           ac.astype(np.int16)], axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-tpu", action="store_true")
    ap.add_argument("--clips", type=int, default=BATCH)
    args = ap.parse_args()

    import bench
    from laryngeal_tpu.data.native import decode_frames_auto
    from laryngeal_tpu.data.samplers import FrameSampler

    paths = bench.ensure_videos()[: args.clips]
    sampler = FrameSampler("random", NUM_FRAMES, seed=1234)
    clips = [decode_frames_auto(p, sampler(str(p), 96),
                                resize_to=(CROP, CROP), fmt="i420")
             for p in paths]
    batch = np.stack(clips)  # (B, T, H*1.5, W) uint8

    arms = {}
    arms["raw"] = (batch, 0.0)
    delta = batch.copy()
    delta[:, 1:] = batch[:, 1:] - batch[:, :-1]
    arms["delta"] = (delta, 0.0)
    for tol in (2, 4, 8):
        enc = np.stack([dpcm_encode(c, tol)[0] for c in clips])
        dec = np.stack([dpcm_decode(e) for e in enc])
        err = np.abs(dec.astype(np.int16) - batch.astype(np.int16))
        arms[f"dpcm-t{tol}"] = (enc, float(err.max()))
    for q in (90, 75, 60):
        enc = np.stack([dct_encode_clip(c, q) for c in clips])
        dec = np.stack([dct_decode_clip(e, CROP, CROP, q) for e in enc])
        err = (dec.astype(np.float32) - batch.astype(np.float32))
        mse = float((err ** 2).mean())
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        arms[f"dct-q{q}"] = (enc, float(np.abs(err).max()), psnr)
        # Packed: int8 AC planes + int16 DC plane (DC exceeds int8 range).
        dcs, acs = zip(*(pack_dct_int8(e) for e in enc))
        packed = np.concatenate(
            [np.stack(dcs).view(np.int8).reshape(len(clips), -1),
             np.stack(acs).reshape(len(clips), -1)], axis=1)
        dec8 = np.stack([
            dct_decode_clip(unpack_dct_int8(d, a), CROP, CROP, q)
            for d, a in zip(dcs, acs)])
        err8 = (dec8.astype(np.float32) - batch.astype(np.float32))
        psnr8 = 10 * np.log10(255.0 ** 2 / max(float((err8 ** 2).mean()), 1e-9))
        arms[f"dct8-q{q}"] = (packed, float(np.abs(err8).max()), psnr8)
    arms["zeros"] = (np.zeros_like(batch), 0.0)

    print(f"{'arm':10s} {'MB':>7s} {'zlib1':>6s} {'zlib6':>6s} "
          f"{'maxerr':>6s} {'psnr':>6s} {'h2d MB/s':>9s} {'eff clip/s':>10s}")

    tpu_fn = None
    if not args.no_tpu:
        import jax
        # Session warmup: large random payload (zeros don't trigger it).
        rng = np.random.default_rng(0)
        warm = rng.integers(0, 255, batch.shape, dtype=np.uint8)
        t0 = time.perf_counter()
        np.asarray(jax.device_put(warm)[0, 0, 0, :4])
        print(f"# relay warmup {time.perf_counter() - t0:.1f}s", flush=True)
        resident = jax.device_put(rng.integers(0, 255, (8, 8), dtype=np.uint8))
        np.asarray(resident)
        lats = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(resident[0, 0])
            lats.append(time.perf_counter() - t0)
        latency = float(np.median(lats))
        print(f"# fetch latency {latency * 1e3:.0f} ms", flush=True)

        def measure(payload: np.ndarray) -> float:
            rates = []
            for it in range(3):
                # Fresh bytes each time (dedup-proof): XOR a per-iter salt
                # into the last axis tail — tiny entropy add, new hash.
                p = payload.copy()
                p.reshape(-1)[it::4096] ^= np.uint8(it + 1) if p.dtype == np.uint8 else np.int16(it + 1)
                t0 = time.perf_counter()
                d = jax.device_put(p)
                np.asarray(d.reshape(-1)[:4])
                dt = max(time.perf_counter() - t0 - latency, 1e-6)
                rates.append(p.nbytes / dt / 1e6)
            return float(np.median(rates))

        tpu_fn = measure

    mb_i420 = batch.nbytes / 1e6
    for name, info in arms.items():
        enc, maxerr = info[0], info[1]
        psnr = info[2] if len(info) > 2 else float("nan")
        z1 = len(zlib.compress(enc.tobytes(), 1))
        z6 = len(zlib.compress(enc.tobytes(), 6))
        mbps = tpu_fn(enc) if tpu_fn else float("nan")
        # effective clips/s through the transfer stage if this arm shipped
        eff = mbps / (enc.nbytes / 1e6) * args.clips if tpu_fn else float("nan")
        print(f"{name:10s} {enc.nbytes / 1e6:7.1f} "
              f"{enc.nbytes / z1:6.2f} {enc.nbytes / z6:6.2f} "
              f"{maxerr:6.1f} {psnr:6.1f} {mbps:9.1f} {eff:10.1f}",
              flush=True)


if __name__ == "__main__":
    main()
