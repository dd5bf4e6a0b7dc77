"""Benchmark — ViViT-B 32x224^2 end-to-end decode->logits clips/sec/chip.

The north-star metric from BASELINE.json: host decode + sampling + jitted
(preprocess -> ViViT-B forward) on one TPU chip, with decode overlapped via
a producer thread. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N,
   "breakdown": {...}}

The breakdown separates the pipeline stages so the end-to-end number can be
attributed (round-1 VERDICT weak #1: "no decode/transfer/compute breakdown,
no compute-only clips/s, no MFU"):

- decode_clips_per_sec: host libav decode+scale (+wire encode) only;
- h2d_mbps / h2d_latency_s: measured relay transfer bandwidth on fresh
  (incompressible, dedup-proof) payloads; h2d_mbps_payload: effective rate
  on the actual (compressible) wire payload when BENCH_WIRE=dct;
- compute_only_clips_per_sec: pre-staged device batches, ITERS iterations
  chained inside ONE jit (lax.fori_loop with carry dependence, per the
  CLAUDE.md microbenchmark rule) — the pure TPU decode->logits graph
  (YUV->RGB, HF preprocess, ViViT-B bf16 fwd, softmax);
- mfu_pct: compute-only FLOP rate / peak (ViViT-B fwd ~0.92 TFLOP/clip,
  analytic count below; peak defaults to v5e bf16 197 TFLOPs, override with
  BENCH_PEAK_TFLOPS);
- transfer_share_pct / decode_share_pct: stage-time shares implied by the
  measured stage rates at the e2e operating point.

Train-step throughput (preprocess->fwd->bwd->adamw, donated state, chained
in one jit) runs when BENCH_TRAIN=1 — it adds a multi-minute remote compile,
so the driver's default run stays within budget; measured numbers live in
BASELINE.md.

vs_baseline: the reference publishes no numbers (BASELINE.json "published"
is {}) and no GPU exists in this image, so the baseline is the PyTorch
reference pipeline (HF VivitImageProcessor per batch + torch
VivitForVideoClassification forward, torch CPU) measured locally once and
cached in BENCH_BASELINE.json. It is a *CPU* torch baseline — stated here so
the ratio is not mistaken for the (unavailable) GPU comparison. For the
GPU-class comparison the honest figure is compute_only_clips_per_sec vs an
A100-class ViViT-B forward (312 bf16 TFLOPs at a generous 40% MFU over
0.92 TFLOP/clip ~= 135 clips/s — no GPU here to measure, estimate stated in
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

NUM_FRAMES = 32
CROP = 224
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
N_VIDEOS = int(os.environ.get("BENCH_N_VIDEOS", "48"))
BENCH_DIR = Path(os.environ.get("BENCH_DATA_DIR", "/tmp/laryngeal_bench_data"))
BASELINE_CACHE = Path(__file__).parent / "BENCH_BASELINE.json"
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))  # v5e bf16
# Wire formats (host->device payload for the I420 clip):
#   "raw"   I420 planes (lossless)
#   "delta" mod-256 temporal deltas of the planes (lossless; the relay's
#           content compression moves them slightly faster)
#   "dct"   quantized 8x8 DCT coefficient planes (preprocess/dct_wire.py) —
#           mostly zero runs, which the relay compresses dramatically;
#           bounded loss at BENCH_DCT_QUALITY (pinned in tests/test_dct_wire.py
#           and measured per-session in the wire A/B)
#
# Default: dctp q75 keep15 pack8 — dct at quality 75 keeping 15/63 AC
# planes, zigzag planes >= 8 nibble-packed (4-bit signed): 14 byte-planes
# per 8x8 block = 0.53 MB/clip, 44% fewer wire bytes than the round-3
# k31p14 arm. Measured (BASELINE.md round-3 DCT wire study, interleaved
# same-session A/B, 5 rounds each): dct beat delta in every matched pair
# (median 17.81 vs 15.52); dctp k31p14 beat dct in every pair (22.60 vs
# 20.76); k15p8 beat k31p14 in every pair (median 27.34 vs 23.63, +15.7%)
# — the relay hashes/compresses raw payload bytes on the single host core,
# so raw bytes are the lever. Loss accounting on real clips
# (scripts/probe_wire_drift.py): max softmax-probability drift vs lossless
# — k31p14 0.0038, k23p8 0.0048, k15p8 0.0059 (mean 0.0028); PSNR 24.9 vs
# 25.6 dB — all far below the decision-boundary scale, and the source
# videos are already H.264 lossy. BENCH_WIRE=delta restores the bit-exact
# lossless wire; BENCH_DCT_KEEP=31 BENCH_DCT_PACK_FROM=14 the near-lossless
# transform wire.
WIRE = os.environ.get("BENCH_WIRE", "dctp")
DCT_QUALITY = int(os.environ.get("BENCH_DCT_QUALITY", "75"))
# AC planes kept (zigzag order, <=63): high-frequency planes at q75 are
# almost entirely zero; truncation trades measured drift for bytes.
DCT_KEEP = int(os.environ.get("BENCH_DCT_KEEP", "15"))
# "dctp" wire: like dct but zigzag planes >= BENCH_DCT_PACK_FROM are clamped
# to signed 4-bit and nibble-packed pairwise (preprocess/dct_wire.py
# pack_ac_planes) — the relay hashes/compresses RAW payload bytes on the
# single host core (BASELINE.md stall attribution), so fewer raw bytes cut
# the stall AND the transfer. Plane stats at q75: planes >= 14 essentially
# never clamp (<=2e-4); planes 8-13 clamp 0.05-0.26% (drift included in the
# loss accounting above).
DCT_PACK_FROM = int(os.environ.get("BENCH_DCT_PACK_FROM", "8"))


def wire_params(wire: str):
    """Parse a wire spec into ``(kind, quality, keep_ac, pack_from)``.

    Plain names ("raw", "delta", "dct", "dctp") use the BENCH_DCT_* env
    defaults; a parameterized spec like ``dctp@q75k23p8`` (or ``dct@q60k31``,
    optionally with an ``l<n>`` lowres-decode suffix — see
    :func:`wire_lowres`) overrides them per arm — this is what lets
    BENCH_WIRE_AB_ARMS compare wire PARAMETERS inside one relay session, so
    session weather hits all arms equally."""
    if "@" not in wire:
        return wire, DCT_QUALITY, DCT_KEEP, DCT_PACK_FROM
    kind, spec = wire.split("@", 1)
    m = re.fullmatch(r"q(\d+)k(\d+)(?:p(\d+))?(?:l([0-3]))?", spec)
    if kind not in ("dct", "dctp") or m is None:
        raise ValueError(f"bad wire spec {wire!r} (want e.g. dctp@q75k23p8, "
                         f"optional lowres suffix l0-l3)")
    return (kind, int(m.group(1)), int(m.group(2)),
            int(m.group(3)) if m.group(3) else DCT_PACK_FROM)


def wire_lowres(wire: str) -> int:
    """Lowres decode level for a wire arm: the ``l<n>`` spec suffix
    (``dctp@q75k15p8l1``), else the BENCH_LOWRES env default. Level n means
    the mpeg4 decoder runs its iDCT/motion-comp at 1/2**n scale and every
    wire stage (fDCT, payload, device decode) operates on the reduced
    geometry; the jitted preprocess resizes back to the model's 224 input
    (vivit HF semantics resize from any source size). Lossy — drift
    accounted in BASELINE.md alongside the DCT-wire loss.

    The BENCH_LOWRES default applies to the transform-coded (dct/dctp)
    wires only: raw/delta/i420 are the exact-transport arms and stay
    full-resolution unless BENCH_LOWRES is set explicitly."""
    wire = wire or WIRE
    if "@" in wire:
        m = re.fullmatch(r"q\d+k\d+(?:p\d+)?(?:l([0-3]))?",
                         wire.split("@", 1)[1])
        if m and m.group(1):
            return int(m.group(1))
    kind = wire.split("@", 1)[0]
    if kind not in ("dct", "dctp") and "BENCH_LOWRES" not in os.environ:
        return 0
    return LOWRES


# Round-4 lowres study (BASELINE.md): decoding the mpeg4 source at 1/2
# resolution (the decoder's own partial-iDCT `lowres` path) and carrying
# 112^2 geometry through fDCT -> wire -> device decode -> resize-to-224
# beat full-res k15p8 in every matched same-session pair (interleaved A/B:
# median 29.22 vs 25.35 clips/s, +15.3%) — 4x fewer wire bytes AND ~2x
# less host decode+fDCT CPU. Max softmax drift vs lossless: 0.0109
# (probe_wire_drift.py, lowres arms). BENCH_LOWRES=0 restores full-res.
LOWRES = int(os.environ.get("BENCH_LOWRES", "1"))


def _wire_hw(wire: str = None) -> int:
    """Host-decode / wire geometry (square) for an arm: CROP >> lowres."""
    return CROP >> wire_lowres(wire or WIRE)


def _dct_geometry(wire: str = None) -> int:
    """8x8-block count per frame at the arm's wire geometry."""
    from laryngeal_tpu.preprocess.dct_wire import block_geometry

    hw = _wire_hw(wire)
    return block_geometry(hw, hw)[2]


def _dct_planes_per_block(wire: str) -> float:
    """Wire bytes per 8x8 block (DC int16 + AC payload planes)."""
    kind, _, keep, pack = wire_params(wire)
    if kind == "dctp":
        p = min(pack, keep)
        return 2 + p + (keep - p + 1) // 2
    return 2 + keep


def vivit_b_fwd_tflops_per_clip() -> float:
    """Analytic ViViT-B forward FLOPs (multiply-adds x2) at 32x224^2."""
    d, layers = 768, 12
    n = (NUM_FRAMES // 2) * (CROP // 16) ** 2 + 1  # 3137 tokens
    per_layer = 24 * n * d * d + 4 * n * n * d     # qkv/out/mlp + 2 attn matmuls
    embed = 2 * (n - 1) * d * (2 * 16 * 16 * 3)    # tubelet projection
    return (layers * per_layer + embed) / 1e12


def ensure_videos() -> list:
    """Synthetic 224x224 mp4s (~3s @ 30fps) reused across runs."""
    from laryngeal_tpu.data.synthetic import synth_video
    from laryngeal_tpu.data.video import write_video
    import numpy as np

    BENCH_DIR.mkdir(parents=True, exist_ok=True)
    paths = sorted(BENCH_DIR.glob("*.mp4"))
    if len(paths) >= N_VIDEOS:
        return paths[:N_VIDEOS]
    for i in range(N_VIDEOS):
        p = BENCH_DIR / f"bench_{i:03d}.mp4"
        if not p.exists():
            # Per-file seed: a partially generated directory regenerates
            # identical content to a fresh run.
            rng = np.random.default_rng(i)
            clip = synth_video(rng, 96, CROP, CROP, referral=bool(i % 2))
            write_video(p, clip, fps=30)
    return sorted(BENCH_DIR.glob("*.mp4"))[:N_VIDEOS]


def build_model():
    import jax
    import jax.numpy as jnp

    from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification

    cfg = VivitConfig(num_frames=NUM_FRAMES, image_size=CROP, num_classes=2,
                      dtype=jnp.bfloat16)
    model = VivitForVideoClassification(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, NUM_FRAMES, CROP, CROP, 3), jnp.float32)
    )["params"]
    return model, params


def make_forward(model, wire: str = None):
    import jax

    from laryngeal_tpu.preprocess.dct_wire import (
        decode_to_rgb, decode_to_rgb_packed)
    from laryngeal_tpu.preprocess.transforms import (
        batch_preprocess, temporal_delta_decode, yuv420_to_rgb)

    wire = wire or WIRE
    kind, quality, keep, _ = wire_params(wire)
    hw = _wire_hw(wire)  # lowres arms decode the wire at reduced geometry

    @jax.jit
    def forward(params, payload):
        # Wire format: I420 (1.5 B/px) — half the host->device bytes of
        # RGB24 — shipped as mod-256 temporal deltas when wire=delta (the
        # relay moves lower-entropy payloads faster) or as quantized DCT
        # coefficient planes when wire=dct (mostly zero runs — the relay's
        # content compression moves those ~4x faster; bounded loss). dctp
        # additionally nibble-packs the high-frequency planes (fewer raw
        # bytes for the relay to hash/compress on the 1-core host). A
        # lowres arm (wire_lowres > 0) carries hw = CROP >> l geometry end
        # to end on the host; batch_preprocess's vivit regime resizes the
        # decoded RGB back up to the model's 224 input on device.
        if kind == "dctp":
            dc, ac_hi, ac_pk = payload
            rgb = jax.vmap(
                lambda d, h_, p_: decode_to_rgb_packed(
                    d, h_, p_, hw, hw, quality, keep)
            )(dc, ac_hi, ac_pk)
        elif kind == "dct":
            dc, ac = payload
            rgb = jax.vmap(
                lambda d, a: decode_to_rgb(d, a, hw, hw, quality)
            )(dc, ac)
        else:
            clips_yuv = payload
            if wire == "delta":
                clips_yuv = temporal_delta_decode(clips_yuv, axis=1)
            rgb = jax.vmap(lambda c: yuv420_to_rgb(c, hw, hw))(clips_yuv)
        clips = batch_preprocess(rgb, "vivit", train=False, crop=CROP)
        return jax.nn.softmax(model.apply({"params": params}, clips), axis=-1)

    return forward


def warmup_relay(forward, params, wire: str = None):
    """Compile + pay the relay's one-time large-incompressible-transfer cost.
    Must be *random* bytes: zeros don't trigger the ~200 s session warmup."""
    import jax.numpy as jnp
    import numpy as np

    rng0 = np.random.default_rng(123)
    wire = wire or WIRE
    kind, _, keep, pack = wire_params(wire)
    hw = _wire_hw(wire)
    if kind == "dctp":
        nb = _dct_geometry(wire)
        p = min(pack, keep)
        q = (keep - p + 1) // 2
        dummy = (
            jnp.asarray(rng0.integers(-300, 300, (BATCH, NUM_FRAMES, nb),
                                      dtype=np.int16)),
            jnp.asarray(rng0.integers(-128, 128, (BATCH, p, NUM_FRAMES, nb)
                                      ).astype(np.int8)),
            jnp.asarray(rng0.integers(0, 256, (BATCH, q, NUM_FRAMES, nb)
                                      ).astype(np.uint8)),
        )
    elif kind == "dct":
        nb = _dct_geometry(wire)
        dummy = (
            jnp.asarray(rng0.integers(-300, 300, (BATCH, NUM_FRAMES, nb),
                                      dtype=np.int16)),
            jnp.asarray(rng0.integers(-128, 128,
                                      (BATCH, keep, NUM_FRAMES, nb)
                                      ).astype(np.int8)),
        )
    else:
        dummy = jnp.asarray(rng0.integers(
            0, 255, (BATCH, NUM_FRAMES, hw * 3 // 2, hw), dtype=np.uint8))
    np.asarray(forward(params, dummy))


def prebuild_native() -> float:
    """Force the lazy `make` build of native/libcliploader.so BEFORE any
    timed section. The .so is gitignored, so on a fresh checkout (every
    driver round) the first decode_frames_auto call used to trigger the
    build *inside* bench_decode_only's timed loop — deflating the decode
    stage rate (r04's 27.8 and this round's first 3.7 clips/s vs the 34-38
    BASELINE.md pins; see "Round-5 decode-probe anomaly, resolved").
    Returns the wall seconds the load/build took (0.0-ish when already
    built) so the JSON can show whether this session paid it."""
    from laryngeal_tpu.data import native

    t0 = time.perf_counter()
    native.available()  # loads, building with make if needed
    return time.perf_counter() - t0


def bench_decode_only(paths, sampler_seed=0, wire: str = None):
    """Host decode+scale (+wire encode) rate, no device involvement.

    Returns ``(wall_rate, cpu_rate)`` clips/s: best of two timed passes on
    the perf_counter and thread_time bases respectively (see comment below
    on why both exist)."""
    from laryngeal_tpu.data.native import decode_frames_auto
    from laryngeal_tpu.data.samplers import FrameSampler
    from laryngeal_tpu.preprocess.dct_wire import encode_clip, encode_clip_packed

    wire = wire or WIRE
    kind, quality, keep, pack = wire_params(wire)
    hw, lr = _wire_hw(wire), wire_lowres(wire)
    sampler = FrameSampler("random", NUM_FRAMES, seed=sampler_seed + 7)
    # Warmup outside the timer: codec init + page-cache for the first files
    # (the build itself is handled by prebuild_native in main()).
    for p in paths[:2]:
        decode_frames_auto(p, list(range(NUM_FRAMES)),
                           resize_to=(hw, hw), fmt="i420", lowres=lr)

    def one_pass():
        t0, c0 = time.perf_counter(), time.thread_time()
        for p in paths:
            clip = decode_frames_auto(p, sampler(str(p), 96),
                                      resize_to=(hw, hw), fmt="i420",
                                      lowres=lr)
            if kind == "dctp":  # dct arms pay their host fDCT (+pack) here
                encode_clip_packed(clip, quality, keep, pack)
            elif kind == "dct":
                encode_clip(clip, quality, keep)
        return (len(paths) / (time.perf_counter() - t0),
                len(paths) / (time.thread_time() - c0))

    # Two timed passes, report the better: pass 1 pays the page-cache cold
    # misses for 46 of the 48 files, and identical deterministic work has
    # been observed to swing 25-33 clips/s WALL on a quiet zero-steal host
    # (hypervisor descheduling the vCPU without guest steal accounting) —
    # so the per-pass CPU-second rate (thread_time, immune to wall stalls,
    # the same basis as the e2e host_cpu_s accounting) rides along in the
    # breakdown as the stable stage figure.
    r1, r2 = one_pass(), one_pass()
    return max(r1[0], r2[0]), max(r1[1], r2[1])


def bench_transfer(paths=None, wire: str = None) -> dict:
    """Fresh-payload h2d bandwidth + relay fetch latency.

    Two rates: ``h2d_mbps`` on incompressible random bytes (pure session
    weather, comparable across rounds and wire formats) and — when the wire
    is compressible-by-design (dct) and real clips are available —
    ``h2d_mbps_payload`` on an actual encoded batch (the rate the pipeline
    experiences; the relay content-compresses, which is the dct wire's whole
    mechanism, so the random probe badly understates it)."""
    import jax
    import numpy as np

    rng = np.random.default_rng(99)
    shape = (BATCH, NUM_FRAMES, CROP * 3 // 2, CROP)
    nbytes = int(np.prod(shape))
    # Fetch latency baseline (tiny d2h round-trip).
    resident = jax.device_put(rng.integers(0, 255, (8, 8), dtype=np.uint8))
    np.asarray(resident)
    lat_samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(resident[0, 0])
        lat_samples.append(time.perf_counter() - t0)
    latency = float(np.median(lat_samples))

    def rate_of(make_payload):
        rates = []
        for it in range(2):
            arr = make_payload(it)  # fresh bytes each iter: dedup-proof
            t0 = time.perf_counter()
            dev = jax.device_put(arr)
            leaves = jax.tree.leaves(dev)
            np.asarray(leaves[0].reshape(-1)[:1])
            dt = max(time.perf_counter() - t0 - latency, 1e-6)
            rates.append(sum(a.nbytes for a in jax.tree.leaves(arr)) / dt / 1e6)
        return max(rates)

    out = {
        "h2d_mbps": round(
            rate_of(lambda it: rng.integers(0, 255, shape, dtype=np.uint8)), 1),
        "h2d_latency_s": round(latency, 3),
    }
    w_kind, w_q, w_k, w_p = wire_params(wire or WIRE)
    if w_kind in ("dct", "dctp") and paths:
        from laryngeal_tpu.data.native import decode_frames_auto
        from laryngeal_tpu.data.samplers import FrameSampler
        from laryngeal_tpu.preprocess.dct_wire import (
            encode_clip, encode_clip_packed)

        sampler = FrameSampler("uniform", NUM_FRAMES, seed=42)
        hw, lr = _wire_hw(wire), wire_lowres(wire)

        def enc1(p):
            clip = decode_frames_auto(p, sampler(str(p), 96),
                                      resize_to=(hw, hw), fmt="i420",
                                      lowres=lr)
            if w_kind == "dctp":
                return encode_clip_packed(clip, w_q, w_k, w_p)
            return encode_clip(clip, w_q, w_k)

        enc = [enc1(p) for p in paths[:BATCH]]
        arrays = tuple(np.stack([e[i] for e in enc])
                       for i in range(len(enc[0])))

        def dct_payload(it):
            # Salt a sparse stripe of EVERY array so each iteration hashes
            # differently — an unsalted copy would let the relay's
            # content-hash dedup serve it from cache on iteration 2,
            # inflating the measured rate. The stripe is 1/4096 of the
            # elements: compressed size is unaffected at the reported
            # precision (measured), so the probe still sees the real
            # payload's compressibility.
            out_arrays = []
            for a in arrays:
                a = a.copy()
                a.reshape(-1)[it::4096] ^= np.asarray(it + 1, a.dtype)
                out_arrays.append(a)
            return tuple(out_arrays)

        out["h2d_mbps_payload"] = round(rate_of(dct_payload), 1)
    return out


def bench_compute_only(forward, params) -> float:
    """Pre-staged device batches, ITERS chained inside one jit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    K, ITERS = 4, 12
    rng = np.random.default_rng(7)
    w_kind, _, w_keep, w_pack = wire_params(WIRE)
    hw = _wire_hw()
    if w_kind == "dctp":
        nb = _dct_geometry(WIRE)
        p = min(w_pack, w_keep)
        q = (w_keep - p + 1) // 2
        batches = (
            jnp.asarray(rng.integers(-300, 300, (K, BATCH, NUM_FRAMES, nb),
                                     dtype=np.int16)),
            jnp.asarray(rng.integers(
                -128, 128, (K, BATCH, p, NUM_FRAMES, nb)).astype(np.int8)),
            jnp.asarray(rng.integers(
                0, 256, (K, BATCH, q, NUM_FRAMES, nb)).astype(np.uint8)),
        )
    elif w_kind == "dct":
        # Stage wire-format payloads so compute-only includes the on-device
        # dequant+IDCT (it is part of the real decode->logits graph).
        nb = _dct_geometry(WIRE)
        batches = (
            jnp.asarray(rng.integers(-300, 300, (K, BATCH, NUM_FRAMES, nb),
                                     dtype=np.int16)),
            jnp.asarray(rng.integers(
                -128, 128, (K, BATCH, w_keep, NUM_FRAMES, nb)
            ).astype(np.int8)),
        )
    else:
        batches = jnp.asarray(rng.integers(
            0, 255, (K, BATCH, NUM_FRAMES, hw * 3 // 2, hw),
            dtype=np.uint8))

    # Re-use the already-compiled `forward` inside the chain so only the
    # loop wrapper compiles here.
    @jax.jit
    def chain(params, batches):
        def body(i, acc):
            out = forward(params, jax.tree.map(lambda b: b[i % K], batches))
            return acc + out.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    np.asarray(chain(params, batches))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(chain(params, batches))
    dt = time.perf_counter() - t0
    return ITERS * BATCH / dt


def bench_train_step(model_name: str = "vivit") -> float:
    """Full train step (preprocess->fwd->bwd->opt) clips/sec for one model
    family, pre-staged batch, chained iterations. BENCH_TRAIN=1 only
    (multi-minute remote compile); BENCH_TRAIN_MODELS picks families."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from laryngeal_tpu.models.registry import create_model, get_model_spec
    from laryngeal_tpu.train.state import create_train_state
    from laryngeal_tpu.train.steps import make_train_step

    spec = get_model_spec(model_name)
    # Each family trains at its reference default clip length. TimeSformer's
    # reference default is 32 frames (timesformer/main.py:39), which OOMs at
    # B8 without remat — bench it the way cli.main actually runs it
    # (auto-remat past the measured cliff).
    frames = spec.default_num_frames
    trainable_mask_fn = None
    if model_name == "vivit":
        model, _ = build_model()
    else:
        kwargs = {"num_classes": 2}
        if model_name == "timesformer":
            kwargs.update(num_frames=frames, image_size=CROP)
            if frames * BATCH >= 32 * 8:
                kwargs["remat"] = True
        if model_name == "swin3d":
            kwargs.update(model_size="tiny")
        if model_name == "resnet50_lstm":
            from laryngeal_tpu.models.resnet import backbone_param_mask

            trainable_mask_fn = backbone_param_mask
        model = create_model(model_name, dtype=jnp.bfloat16, **kwargs)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, frames, CROP, CROP, 3), jnp.float32),
        optimizer=spec.optimizer, learning_rate=1e-3, weight_decay=0.01,
        trainable_mask_fn=trainable_mask_fn,
    )
    step = make_train_step(model, spec.preprocess_regime, spec.loss, crop=CROP)

    rng = np.random.default_rng(11)
    pixel = jnp.asarray(rng.integers(
        0, 255, (BATCH, frames, CROP, CROP, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (BATCH,)).astype(np.int32))
    mask = jnp.ones((BATCH,), jnp.bool_)
    key = jax.random.PRNGKey(1)

    ITERS = 6

    # Chain the iterations inside ONE jit (fori_loop with the state as the
    # carry) per the microbenchmark rule — separate dispatches would charge
    # per-call relay latency to the step time. The inner jitted step inlines
    # under the outer trace.
    @jax.jit
    def chain(state):
        def body(i, carry):
            st, _ = carry
            st, m = step(st, pixel, labels, mask, key)
            return st, m["loss"]
        return jax.lax.fori_loop(0, ITERS, body, (state, jnp.float32(0)))

    state, loss = chain(state)  # compile + warm
    np.asarray(loss)
    t0 = time.perf_counter()
    _, loss = chain(state)
    np.asarray(loss)
    return ITERS * BATCH / (time.perf_counter() - t0)


def bench_tpu(paths, forward, params, pass_seed: int = 0,
              wire: str = None, stats: dict = None) -> float:
    """One end-to-end pass; returns clips/sec. If ``stats`` is passed, it is
    filled with the pass's own transfer accounting (uploader busy seconds,
    MB moved, effective MB/s) — the self-consistent basis for the
    bandwidth-normalized headline (a separate 2-sample probe can measure a
    different minute of relay weather than the pass it normalizes)."""
    import jax
    import numpy as np

    from laryngeal_tpu.data.samplers import FrameSampler

    wire = wire or WIRE
    kind, quality, keep, pack = wire_params(wire)
    hw, lr = _wire_hw(wire), wire_lowres(wire)

    # pass_seed 0 = the nominal uniform-sampling pass; later passes draw
    # seeded random indices so their transfer payloads are NOT byte-identical
    # (the relay content-hashes payloads; repeating bytes would measure its
    # dedup cache, not steady-state throughput).
    if pass_seed == 0:
        sampler = FrameSampler("uniform", NUM_FRAMES)
    else:
        sampler = FrameSampler("random", NUM_FRAMES, seed=pass_seed)

    # Three-stage pipeline: decode thread -> host-batch queue -> transfer
    # thread (device_put) -> device queue -> compute. Splitting decode and
    # h2d into separate threads overlaps the two host-side costs with each
    # other as well as with compute (measured ~9% over the round-1 2-stage
    # producer on matched passes). Native libav decode emits I420 planes
    # directly (no BGR roundtrip).
    import queue
    import threading

    q_dec: "queue.Queue" = queue.Queue(maxsize=4)
    q_dev: "queue.Queue" = queue.Queue(maxsize=4)

    from laryngeal_tpu.data.native import decode_frames_auto
    from laryngeal_tpu.preprocess.dct_wire import (
        encode_clip, encode_clip_packed)
    from laryngeal_tpu.preprocess.transforms import temporal_delta_encode

    def stack_batch(batch):
        if isinstance(batch[0], tuple):  # dct/dctp wire payload parts
            return tuple(np.stack([b[i] for b in batch])
                         for i in range(len(batch[0])))
        return np.stack(batch)

    # Per-thread CPU-second accounting (time.thread_time): on this 1-core
    # host the three stages share the core, so their CPU sums bound the pass
    # — the attribution says whether a slow pass is decode CPU, uploader
    # serialize/hash CPU, or genuine stall (wall - total CPU).
    cpu_s = {"decode": 0.0, "upload": 0.0}

    def decoder():
        batch = []
        t_cpu0 = time.thread_time()
        try:
            for p in paths:
                clip = decode_frames_auto(p, sampler(str(p), 96),
                                          resize_to=(hw, hw), fmt="i420",
                                          lowres=lr)
                if kind == "delta":
                    clip = temporal_delta_encode(clip)
                elif kind == "dctp":
                    clip = encode_clip_packed(clip, quality, keep, pack)
                elif kind == "dct":
                    clip = encode_clip(clip, quality, keep)
                batch.append(clip)
                if len(batch) == BATCH:
                    q_dec.put(stack_batch(batch))
                    batch = []
            if batch:
                while len(batch) < BATCH:
                    batch.append(batch[-1])
                q_dec.put(stack_batch(batch))
        finally:
            cpu_s["decode"] = time.thread_time() - t_cpu0
            q_dec.put(None)  # never strand downstream, even on decode errors

    xfer_bytes = [0]

    def uploader():
        t_cpu0 = time.thread_time()
        try:
            while True:
                item = q_dec.get()
                if item is None:
                    break
                # NOTE: device_put through the relay is ASYNC (measured: the
                # calls account for ~0.2 s of a pass that moves 115 MB) — do
                # not time it; the transfer cost is inferred from the pass
                # itself via the bottleneck-stage model in main().
                xfer_bytes[0] += sum(a.nbytes for a in jax.tree.leaves(item))
                q_dev.put(jax.device_put(item))
        finally:
            cpu_s["upload"] = time.thread_time() - t_cpu0
            q_dev.put(None)

    t0 = time.perf_counter()
    t_cpu_main0 = time.thread_time()
    threading.Thread(target=decoder, daemon=True).start()
    threading.Thread(target=uploader, daemon=True).start()
    out = None
    while True:
        item = q_dev.get()
        if item is None:
            break
        out = forward(params, item)
    # Fetch to host: on the axon relay block_until_ready is not a reliable
    # barrier, but a host transfer serializes behind all queued compute.
    np.asarray(out)
    dt = time.perf_counter() - t0
    if stats is not None:
        stats["xfer_mb"] = xfer_bytes[0] / 1e6
        stats["wall_s"] = dt
        stats["cpu_s"] = {"decode": round(cpu_s["decode"], 3),
                          "upload": round(cpu_s["upload"], 3),
                          "main": round(time.thread_time() - t_cpu_main0, 3)}
    return len(paths) / dt  # count real videos, not pad duplicates


def bench_torch_reference(paths) -> float:
    """The reference pipeline: cv2 decode -> VivitImageProcessor per batch ->
    torch ViViT forward (vivit_transformer/.../trainers/trainer.py:62-104)."""
    import numpy as np
    import torch
    from transformers import VivitConfig as HFConfig
    from transformers import VivitForVideoClassification as HFModel
    from transformers import VivitImageProcessor

    from laryngeal_tpu.data.samplers import FrameSampler
    from laryngeal_tpu.data.video import decode_frames

    cfg = HFConfig(num_frames=NUM_FRAMES, num_labels=2)
    model = HFModel(cfg).eval()
    proc = VivitImageProcessor()
    sampler = FrameSampler("uniform", NUM_FRAMES)

    n = min(len(paths), 8)  # torch-CPU is slow; extrapolate from 8 clips
    t0 = time.perf_counter()
    with torch.no_grad():
        batch = []
        done = 0
        for p in paths[:n]:
            clip = decode_frames(p, sampler(str(p), 96), resize_to=(CROP, CROP))
            batch.append(clip)
            if len(batch) == 4 or done + len(batch) == n:
                inputs = proc([list(c) for c in batch], return_tensors="pt")
                model(**inputs)
                done += len(batch)
                batch = []
    dt = time.perf_counter() - t0
    return n / dt


def get_baseline(paths) -> float:
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())["torch_cpu_clips_per_sec"]
    v = bench_torch_reference(paths)
    BASELINE_CACHE.write_text(json.dumps(
        {"torch_cpu_clips_per_sec": v,
         "note": "PyTorch reference pipeline (HF processor + ViViT-B fwd) on "
                 "CPU — no GPU in this image; measured once and cached"}))
    return v


def _proc_cpu_jiffies():
    """{pid: (comm, utime+stime jiffies)} for every live process. Cheap
    (/proc scan); used to attribute CPU burned by OTHER processes during a
    bench pass — the round-4 scoreboard anomaly (25.0 vs 32.5 median on
    identical code) was unexplainable because nothing recorded whether the
    single host core was quiet."""
    out = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
            comm = raw[raw.index("(") + 1:raw.rindex(")")]
            fields = raw[raw.rindex(")") + 2:].split()
            out[int(d)] = (comm, int(fields[11]) + int(fields[12]))
        except Exception:
            continue
    return out


class HostContention:
    """Competing-process CPU + loadavg over a window (start() .. stop())."""

    def start(self):
        self._t0 = time.perf_counter()
        self._snap0 = _proc_cpu_jiffies()
        self._load0 = os.getloadavg()
        return self

    def stop(self) -> dict:
        wall = time.perf_counter() - self._t0
        snap1 = _proc_cpu_jiffies()
        hz = os.sysconf("SC_CLK_TCK")
        me = os.getpid()
        deltas = []
        for pid, (comm, j1) in snap1.items():
            if pid == me:
                continue
            j0 = self._snap0.get(pid, (comm, 0))[1]
            if j1 > j0:
                deltas.append((comm, (j1 - j0) / hz))
        agg: dict = {}
        for comm, s in deltas:
            agg[comm] = agg.get(comm, 0.0) + s
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:3]
        other = sum(agg.values())
        return {
            "window_s": round(wall, 2),
            "other_proc_cpu_s": round(other, 2),
            "other_proc_cpu_share": round(other / max(wall, 1e-9), 3),
            "top_other": [[c, round(s, 2)] for c, s in top],
            "loadavg_1m": round(os.getloadavg()[0], 2),
            "loadavg_1m_at_start": round(self._load0[0], 2),
        }


def cpu_canary_mb_s(mb: int = 150) -> float:
    """Fixed-work CPU speed probe: sha256 over `mb` MB, returns MB/s.

    The vCPU's *effective* speed varies ~30% across sessions with ZERO guest
    steal accounting and a quiet process table (hypervisor/physical-host
    sharing: observed identical deterministic decode work at 24.9 vs 34.0
    clips/s per CPU-second an hour apart). This canary makes that weather
    measurable: quiet-host reference ~1300-1450 MB/s (BASELINE.md); a session
    reporting materially less is slow at the physical-host level and its
    stage rates understate the code."""
    import hashlib

    block = b"\xa5" * (1 << 20)
    h = hashlib.sha256()
    t0 = time.perf_counter()
    for _ in range(mb):
        h.update(block)
    return mb / (time.perf_counter() - t0)


def host_quiet_guard(threshold_share: float = 0.15,
                     window_s: float = 1.0) -> dict:
    """Pre-pass guard: sample competing CPU for window_s; log LOUDLY when
    the host is not quiet (round-3 already caught pytest contending the
    single core during a bench — this makes that visible in the JSON)."""
    hc = HostContention().start()
    time.sleep(window_s)
    t = hc.stop()
    t["cpu_canary_mb_s"] = round(cpu_canary_mb_s(), 0)
    t["contended"] = t["other_proc_cpu_share"] > threshold_share
    if t["contended"]:
        print(f"*** HOST NOT QUIET: competing processes burned "
              f"{t['other_proc_cpu_share']:.0%} of a core over the last "
              f"{window_s:.0f}s ({t['top_other']}); e2e numbers from this "
              f"session UNDERSTATE the code's throughput ***",
              file=sys.stderr, flush=True)
    return t


def main():
    # Persistent compile cache: repeat bench runs (driver re-runs every
    # round) skip the remote compiles. Measured sections all warm up first,
    # so timings are unaffected; BENCH_COMPILE_CACHE=off disables.
    from laryngeal_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache(os.environ.get("BENCH_COMPILE_CACHE", "/tmp/laryngeal_cc"))

    paths = ensure_videos()
    # Host-quiet guard BEFORE any timing: a contended single-core host
    # depresses every stage rate below (round-4 VERDICT weak #1).
    start_telemetry = host_quiet_guard()

    # Build/load the native decoder OUTSIDE any timed section (fresh driver
    # checkouts have no .so — the lazy in-probe build was the round-4/5
    # decode-stage anomaly, BASELINE.md "Round-5 decode-probe anomaly").
    native_load_s = prebuild_native()

    model, params = build_model()
    forward = make_forward(model)
    warmup_relay(forward, params)

    # Stage rates.
    decode_rate, decode_rate_cpu = bench_decode_only(paths)
    xfer = bench_transfer(paths)
    compute_rate = bench_compute_only(forward, params)
    tflop_per_clip = vivit_b_fwd_tflops_per_clip()
    mfu = compute_rate * tflop_per_clip / PEAK_TFLOPS * 100.0

    # End-to-end (the headline). The relay link's session bandwidth varies
    # 13-43 MB/s (BASELINE.md) and round 2's number swung -23% on identical
    # code — ALWAYS take >= 3 fresh-payload passes (distinct sampler seeds
    # so payloads are dedup-proof), report best + median + the raw list.
    # Round-1's 180 s gate skipped the retry exactly on the slow sessions
    # that needed it (round-2 VERDICT weak #1).
    # 5 fresh-payload passes: the headline is the MEDIAN, and with the
    # relay's per-minute weather a 5-sample median is materially more
    # stable than a 3-sample one (~2 extra minutes of wall).
    n_passes = int(os.environ.get("BENCH_E2E_PASSES", "5"))
    e2e_passes = []
    pass_stats = []
    for s in range(n_passes):
        st: dict = {}
        hc = HostContention().start()
        e2e_passes.append(bench_tpu(paths, forward, params, pass_seed=s,
                                    stats=st))
        st["contention"] = hc.stop()
        pass_stats.append(st)
    best_i = max(range(n_passes), key=lambda i: e2e_passes[i])
    e2e_median = sorted(e2e_passes)[len(e2e_passes) // 2]
    # Headline = MEDIAN of the fresh-payload passes (round-3 VERDICT weak
    # #1): the reproducible statistic. Best-of-n stays in the breakdown.
    value = e2e_median

    # Stage-share attribution at the e2e operating point: per-clip seconds
    # spent in each (overlapped) stage vs the serial bottleneck. Payload
    # bytes/clip and the transfer rate both depend on the wire format: dct
    # ships ~half the bytes (DC int16 + DCT_KEEP int8 AC planes) and moves
    # at the measured effective (content-compressed) rate.
    wire_kind, wire_q, wire_k, wire_p = wire_params(WIRE)
    wire_hw = _wire_hw()
    if wire_kind in ("dct", "dctp"):
        nb = _dct_geometry(WIRE)
        clip_mb = NUM_FRAMES * nb * _dct_planes_per_block(WIRE) / 1e6
        xfer_rate = xfer.get("h2d_mbps_payload", xfer["h2d_mbps"])
    else:
        clip_mb = (NUM_FRAMES * wire_hw * wire_hw * 3 / 2) / 1e6  # I420 bytes
        xfer_rate = xfer["h2d_mbps"]
    t_decode = 1.0 / max(decode_rate, 1e-9)
    t_xfer = clip_mb / max(xfer_rate, 1e-9)
    t_compute = 1.0 / max(compute_rate, 1e-9)
    t_total = t_decode + t_xfer + t_compute

    breakdown = {
        "e2e_passes": [round(v, 2) for v in e2e_passes],
        "e2e_median": round(e2e_median, 2),
        "e2e_best": round(e2e_passes[best_i], 2),
        "decode_clips_per_sec": round(decode_rate, 2),
        "decode_clips_per_sec_cpu": round(decode_rate_cpu, 2),
        "native_load_build_s": round(native_load_s, 2),
        **xfer,
        "compute_only_clips_per_sec": round(compute_rate, 2),
        "mfu_pct": round(mfu, 1),
        "tflop_per_clip_fwd": round(tflop_per_clip, 3),
        "peak_tflops_assumed": PEAK_TFLOPS,
        "decode_share_pct": round(100 * t_decode / t_total, 1),
        "transfer_share_pct": round(100 * t_xfer / t_total, 1),
        "compute_share_pct": round(100 * t_compute / t_total, 1),
        # Host weather per pass (round-4 VERDICT weak #1: the scoreboard
        # must explain itself): competing-process CPU share of each e2e
        # pass window + loadavg, and the pre-run quiet-guard sample. A pass
        # with other_proc_cpu_share >> 0 on this 1-core host is contended,
        # not a code regression.
        "host_quiet_at_start": start_telemetry,
        "e2e_pass_contention": [s.get("contention", {})
                                for s in pass_stats],
        # Effective-vCPU-speed canary after the passes (quiet reference
        # ~1300-1450 MB/s): sessions where this is materially lower are slow at
        # the physical-host level (no guest steal accounting) and every
        # host-side stage rate understates the code by that factor.
        "cpu_canary_mb_s_end": round(cpu_canary_mb_s(), 0),
    }
    # Bandwidth-normalized headline: what this code would do at the nominal
    # 35 MB/s session bandwidth — separates code changes from relay-session
    # luck when comparing rounds. Model: the 3-stage pipeline runs at its
    # bottleneck stage's rate (validated against measurement: at the pass's
    # implied bandwidth the model predicts 17.8 vs 18.0 and 10.4 vs 10.6
    # measured across a fast and a slow session). Point-estimating the
    # in-pass transfer time directly is NOT possible — device_put through
    # the relay is async (uploader busy ~0.2 s for a 115 MB pass) and a
    # separate h2d probe samples a different minute of relay weather (probe
    # 17.6 MB/s vs 25.5 implied in the same run, which would have claimed
    # 37.7 normalized vs ~14 honest).
    nominal_mbps = float(os.environ.get("BENCH_NOMINAL_MBPS", "35"))
    bstat = pass_stats[best_i]
    mb_clip = (bstat.get("xfer_mb", clip_mb * len(paths)) / len(paths))
    # "nominal 35 MB/s" is an *incompressible-bytes* session rate; a
    # compressible wire (dct) moves its payload faster than raw bytes under
    # the same session weather by the measured this-session speedup factor.
    speedup = max(xfer.get("h2d_mbps_payload", xfer["h2d_mbps"])
                  / xfer["h2d_mbps"], 1.0)
    t_norm = max(t_decode, mb_clip / (nominal_mbps * speedup), t_compute)
    breakdown["e2e_implied_mbps"] = round(e2e_passes[best_i] * mb_clip, 1)
    breakdown["e2e_at_nominal_35mbps"] = round(1.0 / t_norm, 2)
    # Host-CPU attribution of the best pass (1-core host: the stage CPU sums
    # bound the pass; wall minus total CPU is genuine stall/fill/drain).
    if "cpu_s" in bstat:
        c = bstat["cpu_s"]
        breakdown["host_cpu_s_best_pass"] = {
            **c, "wall_s": round(bstat["wall_s"], 2),
            "stall_s": round(bstat["wall_s"] - sum(c.values()), 2)}
    if wire_kind in ("dct", "dctp"):
        # Only quote a pinned drift figure for operating points that were
        # actually measured (scripts/probe_wire_drift.py, BASELINE.md
        # wire-parameter sweep); any other (q, keep, pack) gets a pointer,
        # not a number that was never measured for it (round-3 ADVICE).
        wire_l = wire_lowres(WIRE)
        measured_drift = {
            ("dct", 75, 31, None, 0): "0.0038",
            ("dctp", 75, 31, 14, 0): "0.0038",
            ("dctp", 75, 31, 8, 0): "0.0038",
            ("dctp", 75, 23, 8, 0): "0.0048",
            ("dctp", 75, 15, 8, 0): "0.0059",
            ("dctp", 75, 31, 14, 1): "0.0117",
            ("dctp", 75, 23, 8, 1): "0.0114",
            ("dctp", 75, 15, 8, 1): "0.0109",
        }
        key = (wire_kind, wire_q, wire_k,
               wire_p if wire_kind == "dctp" else None, wire_l)
        pack_txt = f" pack{wire_p}" if wire_kind == "dctp" else ""
        lowres_txt = (f" lowres{wire_l}({_wire_hw(WIRE)}px decode)"
                      if wire_l else "")
        drift = measured_drift.get(key)
        drift_txt = (f"max softmax drift vs lossless {drift} (pinned)"
                     if drift else
                     "drift unmeasured at this operating point — run "
                     "scripts/probe_wire_drift.py")
        breakdown["wire"] = (
            f"{wire_kind} q{wire_q} keep{wire_k}{pack_txt}{lowres_txt} "
            f"(lossy: {drift_txt}; BENCH_WIRE=delta for bit-exact)")
    else:
        breakdown["wire"] = WIRE

    if os.environ.get("BENCH_WIRE_AB") == "1":
        # Interleaved wire-format A/B (round-2 VERDICT weak #3): n pass
        # ROUNDS, alternating arm order within the same session (ABBA) so
        # session drift hits all arms equally. Fresh sampler seed per pass.
        n_ab = int(os.environ.get("BENCH_WIRE_AB_PASSES", "5"))
        arms = [a.strip() for a in os.environ.get(
            "BENCH_WIRE_AB_ARMS", "delta,raw,dct").split(",") if a.strip()]
        fwd_by_wire = {w: forward if WIRE == w else make_forward(model, w)
                       for w in arms}
        for w, f in fwd_by_wire.items():
            if f is not forward:
                warmup_relay(f, params, wire=w)  # compile; session warm
        ab = {w: [] for w in arms}
        for i in range(n_ab):
            order = arms if i % 2 == 0 else arms[::-1]
            for w in order:
                ab[w].append(round(bench_tpu(
                    paths, fwd_by_wire[w], params, pass_seed=100 + i,
                    wire=w), 2))
        breakdown["wire_ab"] = {
            w: {"passes": v, "median": sorted(v)[len(v) // 2],
                "mean": round(sum(v) / len(v), 2)}
            for w, v in ab.items()}
    if os.environ.get("BENCH_TRAIN") == "1":
        families = [f.strip() for f in
                    os.environ.get("BENCH_TRAIN_MODELS", "vivit").split(",")
                    if f.strip()]
        for fam in families:
            key = ("train_clips_per_sec_compute" if fam == "vivit"
                   else f"train_clips_per_sec_compute_{fam}")
            breakdown[key] = round(bench_train_step(fam), 2)
            # Each family leaves its compiled train executables (and their
            # device allocations) in the jit cache; five f32 train states
            # plus the e2e graphs OOM a 16 GB chip. The persistent compile
            # cache makes the drop nearly free.
            import jax

            jax.clear_caches()

    try:
        baseline = get_baseline(paths)
        vs = value / baseline if baseline > 0 else None
    except Exception:
        vs = None
    print(json.dumps({
        "metric": "clips/sec/chip (ViViT-B, 32x224^2) end-to-end decode->logits",
        "value": round(value, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "breakdown": breakdown,
    }))


if __name__ == "__main__":
    main()
