"""Decode-stage CPU attribution: where does a wire-encode pass spend time?

Decides round-3 VERDICT #1b (I-frame DCT-coefficient passthrough): that
lever skips the decoder's iDCT and the host fDCT for intra blocks but
still pays the bitstream entropy (VLC) decode, so its ceiling is exactly
the (iDCT + fDCT) share this probe measures. Components, timed on the
bench videos at the adopted lowres1 operating point:

  vlc_floor   — lowres3 decode (28px): the mpeg4 entropy decode + fixed
                per-frame overheads with the transform work scaled to ~1/64
  idct_l1     — lowres1 decode minus that floor: the 1/2-scale iDCT +
                motion-comp + output work a coefficient passthrough could
                (at most, intra blocks only) remove
  fdct_l1     — the host fDCT + nibble-pack at 112px (encode_clip_packed)
  full-res    — same decomposition at 224 for reference

Run on an IDLE host (single core — any concurrent load corrupts this):
    python scripts/probe_decode_attribution.py [--clips 8]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, *a, reps=3, **kw):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*a, **kw)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=8)
    args = ap.parse_args()

    import json

    import bench
    from laryngeal_tpu.data.native import decode_frames_auto
    from laryngeal_tpu.data.samplers import FrameSampler
    from laryngeal_tpu.preprocess.dct_wire import encode_clip_packed

    paths = bench.ensure_videos()[: args.clips]
    nf = bench.NUM_FRAMES
    sampler = FrameSampler("uniform", nf, seed=7)

    def decode_all(lowres, hw):
        for p in paths:
            decode_frames_auto(p, sampler(str(p), 96), resize_to=(hw, hw),
                               fmt="i420", lowres=lowres)

    n = len(paths)
    t224 = timeit(decode_all, 0, 224) / n
    t112 = timeit(decode_all, 1, 112) / n
    t28 = timeit(decode_all, 3, 28) / n

    clips112 = [decode_frames_auto(p, sampler(str(p), 96),
                                   resize_to=(112, 112), fmt="i420", lowres=1)
                for p in paths]
    clips224 = [decode_frames_auto(p, sampler(str(p), 96),
                                   resize_to=(224, 224), fmt="i420")
                for p in paths]

    def enc(clips):
        for c in clips:
            encode_clip_packed(c, 75, 15, 8)

    tf112 = timeit(enc, clips112) / n
    tf224 = timeit(enc, clips224) / n

    stage_l1 = t112 + tf112
    idct_l1 = max(t112 - t28, 0.0)
    out = {
        "per_clip_s": {
            "decode_224": round(t224, 4),
            "decode_112_lowres1": round(t112, 4),
            "decode_28_lowres3_vlc_floor": round(t28, 4),
            "fdct_pack_224": round(tf224, 4),
            "fdct_pack_112": round(tf112, 4),
        },
        "decode_stage_lowres1_s": round(stage_l1, 4),
        "decode_stage_lowres1_clips_per_sec": round(1 / stage_l1, 2),
        # The passthrough's theoretical ceiling: remove ALL the >floor
        # transform work plus the whole fDCT (upper bound — in reality
        # only intra blocks qualify and the floor still includes some
        # transform work at 1/64 scale).
        "passthrough_ceiling_s": round(idct_l1 + tf112, 4),
        "passthrough_ceiling_pct_of_stage": round(
            100 * (idct_l1 + tf112) / stage_l1, 1),
        "vlc_floor_pct_of_stage": round(100 * t28 / stage_l1, 1),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
