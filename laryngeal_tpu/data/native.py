"""ctypes bindings for the native C++ clip decoder (native/cliploader.cpp).

Loads ``native/libcliploader.so`` (building it with make on first use when a
toolchain is present) and exposes the same decode surface as
``data.video.decode_frames`` plus a direct-I420 mode that skips colorspace
conversion entirely for the YUV wire format. Falls back cleanly: callers
should check :func:`available` or use :func:`decode_frames_auto`.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
LIB_PATH = NATIVE_DIR / "libcliploader.so"

_lib = None
_tried = False


def _needs_build() -> bool:
    if not LIB_PATH.exists():
        return True
    so_mtime = LIB_PATH.stat().st_mtime
    return any(src.stat().st_mtime > so_mtime
               for pat in ("*.cpp", "*.h", "Makefile")
               for src in NATIVE_DIR.glob(pat))


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if (NATIVE_DIR / "Makefile").exists() and _needs_build():
        # Rebuild when the .so is missing or older than its sources: a stale
        # build from an older checkout silently lacks newer entry points
        # (the ABI probe below catches the lowres case, but rebuilding is
        # the fix, not just the detection). The mtime check keeps steady
        # state subprocess-free, and the flock serializes concurrent
        # first-loads (two processes racing make would link the same .so
        # non-atomically while the other dlopens a half-written file).
        try:
            import fcntl

            with open(NATIVE_DIR / ".build.lock", "w") as lk:
                fcntl.flock(lk, fcntl.LOCK_EX)
                if _needs_build():  # the lock winner may have built it
                    subprocess.run(["make", "-C", str(NATIVE_DIR)],
                                   check=True, capture_output=True,
                                   timeout=120)
        except Exception as e:  # no toolchain / headers / unwritable dir
            logger.info("native cliploader build failed: %s "
                        "(using the existing .so if present)", e)
    if not LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(LIB_PATH))
    except OSError as e:
        logger.info("native cliploader load failed: %s", e)
        return None
    lib.video_props.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.video_props.restype = ctypes.c_int
    lib.clip_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
    ]
    lib.clip_decode.restype = ctypes.c_int
    if hasattr(lib, "cliploader_abi"):  # feature-level probe (>= round 4)
        lib.cliploader_abi.argtypes = []
        lib.cliploader_abi.restype = ctypes.c_int
    if hasattr(lib, "clip_decode_ex"):  # older .so builds lack it
        lib.clip_decode_ex.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ]
        lib.clip_decode_ex.restype = ctypes.c_int
    if hasattr(lib, "clip_encode_h264"):  # older .so builds lack it
        lib.clip_encode_h264.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.c_char_p,
        ]
        lib.clip_encode_h264.restype = ctypes.c_int
    if hasattr(lib, "clip_dct_encode"):  # older .so builds lack it
        lib.clip_dct_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int8),
        ]
        lib.clip_dct_encode.restype = ctypes.c_int
    if hasattr(lib, "clip_dct_encode_k"):  # keep_ac-aware builds
        lib.clip_dct_encode_k.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int8),
        ]
        lib.clip_dct_encode_k.restype = ctypes.c_int
    if hasattr(lib, "ac_pack_nibble"):  # packed-wire builds
        lib.ac_pack_nibble.argtypes = [
            ctypes.POINTER(ctypes.c_int8), ctypes.c_int, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.ac_pack_nibble.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _abi(lib) -> int:
    """Feature level of the loaded .so (see cliploader.cpp::cliploader_abi);
    builds predating the probe are level 1 at most."""
    return int(lib.cliploader_abi()) if hasattr(lib, "cliploader_abi") else 1


def get_video_properties(path) -> Tuple[int, float, float, int, int]:
    """(total_frames, fps, duration, width, height) via libavformat."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native cliploader unavailable")
    total = ctypes.c_int()
    fps = ctypes.c_double()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.video_props(str(path).encode(), ctypes.byref(total),
                         ctypes.byref(fps), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"Could not open video ({rc}): {path}")
    f = fps.value if fps.value > 0 else 30.0
    return total.value, f, total.value / f, w.value, h.value


def decode_frames(
    path,
    indices: Sequence[int],
    resize_to: Optional[Tuple[int, int]] = None,
    fmt: str = "rgb",
    fast: bool = False,
    lowres: int = 0,
) -> np.ndarray:
    """Decode `indices` natively. fmt 'rgb' -> (N,H,W,3); 'i420' ->
    (N, H*3/2, W) packed planes (cv2-I420 layout, even H/W required).

    ``fast=True`` skips the h264 in-loop deblocking filter (ffmpeg's
    ``-skip_loop_filter all``): every frame is still decoded, but pixels
    drift slightly from the spec decode. Only meant for lossy transports
    (the DCT wire) whose quantization dominates this error; falls back to
    the exact path when the loaded .so predates ``clip_decode_ex``.

    ``lowres=n`` (mpegvideo-family codecs only: mpeg4/mjpeg, NOT h264)
    decodes at 1/2**n resolution — the decoder's iDCT/motion-comp run at
    reduced scale, so this cuts decode CPU rather than just output size.
    Lossy: a partial iDCT is not a downscaled exact decode (drift pinned in
    BASELINE.md). When ``resize_to`` is omitted, the output geometry is the
    source's divided by 2**n; an explicit ``resize_to`` is interpreted in
    OUTPUT (reduced) coordinates. Raises on codecs without lowres support."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native cliploader unavailable")
    lowres = int(lowres)
    if not 0 <= lowres <= 3:
        raise ValueError(f"lowres must be in [0,3], got {lowres}")
    if lowres and _abi(lib) < 2:
        # A level-1 .so exports clip_decode_ex but ignores the lowres bits
        # (full-res decode + downscale) — refuse rather than silently
        # return pixels that don't match the lowres drift accounting.
        raise RuntimeError("loaded .so predates lowres support (abi < 2)")
    idx = sorted(int(i) for i in indices)
    if not idx:
        raise ValueError("decode_frames requires at least one index")
    if resize_to is not None:
        out_w, out_h = resize_to
    else:
        _, _, _, out_w, out_h = get_video_properties(path)
        out_w >>= lowres
        out_h >>= lowres
    if fmt == "i420" and (out_w % 2 or out_h % 2):
        raise ValueError("i420 output needs even dimensions")

    n = len(idx)
    if fmt == "i420":
        out = np.full((n, out_h * 3 // 2, out_w), 127, np.uint8)
        code = 1
    else:
        out = np.full((n, out_h, out_w, 3), 127, np.uint8)
        code = 0
    c_idx = (ctypes.c_int * n)(*idx)
    decoded = ctypes.c_int()
    if (fast or lowres) and hasattr(lib, "clip_decode_ex"):
        flags = (1 if fast else 0) | (lowres << 1)
        rc = lib.clip_decode_ex(
            str(path).encode(), c_idx, n, out_w, out_h, code, flags,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(decoded))
    else:
        rc = lib.clip_decode(str(path).encode(), c_idx, n, out_w, out_h, code,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                             ctypes.byref(decoded))
    if rc != 0:
        raise ValueError(f"native decode failed ({rc}): {path}")
    if decoded.value < n:
        logger.warning("native decode: %d/%d frames decoded for %s "
                       "(rest are gray placeholders)", decoded.value, n, path)
    # Restore the caller's requested order (duplicates map to the first
    # decoded copy, which the C side fills identically).
    if list(indices) != idx:
        out = out[[idx.index(int(i)) for i in indices]]
    return out


def dct_encode(i420: np.ndarray, quality: int, keep_ac: int = 63):
    """Native DCT wire encode: uint8 I420 clip (T, H*3/2, W) ->
    (dc int16 (T, NB), ac int8 (keep_ac, T, NB)). Same tables/rounding as
    preprocess.dct_wire.encode_clip_np (the parity-tested reference).

    keep_ac < 63 allocates and scatter-stores only the kept zigzag planes
    (hot-path win at the default keep 31: half the stores and no
    slice+recopy); on older .so builds lacking clip_dct_encode_k it falls
    back to the full-63 entry point and truncates."""
    lib = _load()
    if lib is None or not hasattr(lib, "clip_dct_encode"):
        raise RuntimeError("native clip_dct_encode unavailable")
    i420 = np.ascontiguousarray(i420, dtype=np.uint8)
    t, h15, w = i420.shape
    h = h15 * 2 // 3
    if h % 16 or w % 16:
        raise ValueError(f"DCT wire needs h, w multiples of 16, got {h}x{w}")
    nb = (h // 8) * (w // 8) + 2 * (h // 16) * (w // 16)
    keep_ac = int(keep_ac)
    if not 0 <= keep_ac <= 63:
        raise ValueError(f"keep_ac must be in [0,63], got {keep_ac}")
    dc = np.empty((t, nb), np.int16)
    if keep_ac < 63 and hasattr(lib, "clip_dct_encode_k"):
        ac = np.empty((keep_ac, t, nb), np.int8)
        rc = lib.clip_dct_encode_k(
            i420.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), t, h, w,
            int(quality), keep_ac,
            dc.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ac.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
        if rc != 0:
            raise ValueError(f"native dct encode failed ({rc})")
        return dc, ac
    ac = np.empty((63, t, nb), np.int8)
    rc = lib.clip_dct_encode(
        i420.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), t, h, w,
        int(quality),
        dc.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ac.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    if rc != 0:
        raise ValueError(f"native dct encode failed ({rc})")
    if keep_ac < 63:
        ac = np.ascontiguousarray(ac[:keep_ac])
    return dc, ac


def ac_pack(ac: np.ndarray) -> np.ndarray:
    """Nibble-pack AC planes (N, ...) int8 -> ((N+1)//2, ...) uint8, pairs of
    planes clamped to [-8, 7] (even plane -> low nibble; odd trailing plane
    pairs with an implicit zero plane). Native counterpart of the numpy path
    in preprocess.dct_wire.pack_ac_planes (parity-tested)."""
    lib = _load()
    if lib is None or not hasattr(lib, "ac_pack_nibble"):
        raise RuntimeError("native ac_pack_nibble unavailable")
    ac = np.ascontiguousarray(ac, dtype=np.int8)
    nplanes = ac.shape[0]
    elems = int(np.prod(ac.shape[1:], dtype=np.int64))
    out = np.empty(((nplanes + 1) // 2,) + ac.shape[1:], np.uint8)
    rc = lib.ac_pack_nibble(
        ac.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), nplanes, elems,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError(f"native ac_pack_nibble failed ({rc})")
    return out


def encoder_available() -> bool:
    """True when the loaded .so exports clip_encode_h264 AND libavcodec was
    built with libx264 (probed lazily on first encode; see encode_h264)."""
    lib = _load()
    return lib is not None and hasattr(lib, "clip_encode_h264")


def encode_h264(path, frames_rgb: np.ndarray, fps: float = 30.0,
                crf: int = 23, preset: str = "veryfast") -> None:
    """Encode RGB uint8 (T, H, W, 3) to h264-in-mp4 via native libx264.

    This is the TPU-host counterpart of the reference's preferred avc1
    writer (src/yolo_detector.py:546-569) and its raw-filter libx264
    re-encode pass (src/yolo_detector.py:625-648): cv2 in this image has no
    h264 encoder, so web-compatible output goes through libavcodec directly.
    Raises RuntimeError when the .so or libx264 is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "clip_encode_h264"):
        raise RuntimeError("native clip_encode_h264 unavailable")
    frames = np.ascontiguousarray(frames_rgb, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected (T,H,W,3) RGB, got {frames.shape}")
    t, h, w, _ = frames.shape
    rc = lib.clip_encode_h264(
        str(path).encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, w, h, float(fps), int(crf), preset.encode())
    if rc == 1:
        raise RuntimeError("libavcodec has no libx264 encoder on this host")
    if rc != 0:
        raise ValueError(f"native h264 encode failed ({rc}): {path}")


def decode_frames_auto(path, indices, resize_to=None, fmt: str = "rgb",
                       fast: bool = False, lowres: int = 0) -> np.ndarray:
    """Native decode when available, cv2 fallback otherwise (rgb only).
    ``fast``/``lowres`` are native-only (see :func:`decode_frames`); the
    cv2 fallback decodes exactly at full resolution, then downscales to the
    requested geometry when ``lowres`` asked for a reduced output."""
    if available():
        try:
            return decode_frames(path, indices, resize_to, fmt, fast=fast,
                                 lowres=lowres)
        except Exception as e:
            logger.warning("native decode failed (%s); falling back to cv2", e)
    from . import video as _video

    if lowres and resize_to is None:
        # video.get_video_properties raises a clear error on unopenable
        # files (vs cv2's silent 0x0, which would surface later as a
        # confusing zero-size resize).
        _, _, _, w, h = (get_video_properties(path) if available()
                         else _video.get_video_properties(path))
        resize_to = (w >> lowres, h >> lowres)
    rgb = _video.decode_frames(path, indices, resize_to=resize_to)
    if fmt == "i420":
        return _video.rgb_to_yuv420(rgb)
    return rgb

