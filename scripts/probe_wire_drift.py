"""Softmax-probability drift + payload size of DCT-wire arms vs lossless.

Sweeps (quality, keep_ac, pack_from) arms of the transform-coded wire
(`laryngeal_tpu/preprocess/dct_wire.py`) on REAL bench clips through the
bench ViViT-B and reports, per arm: max/mean softmax drift vs the lossless
I420 wire, payload MB/clip, and byte-planes per 8x8 block. This is the
loss-accounting companion to the e2e wire A/B in bench.py (BENCH_WIRE_AB);
BASELINE.md records both.

Usage:
    python scripts/probe_wire_drift.py [--clips 8] \
        [--arms "75,31,14;75,23,8;..."]  # quality,keep_ac,pack_from[,lowres]
        # pack_from >= keep_ac means the unpacked dct wire
        # a 4th field (lowres level) decodes the source at 1/2**l geometry
        # (native mpeg4 lowres decode) and carries the reduced size through
        # the wire; the device preprocess resizes back to the model input,
        # so the reported drift includes BOTH the dct quantization and the
        # resolution loss of that arm.
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument(
        "--arms",
        default="75,31,14;75,31,8;75,23,14;75,23,8;75,15,8;85,23,8;75,31,0")
    args = ap.parse_args()

    import bench  # noqa: E402  (repo-root import: reuses geometry + model)
    import jax
    import jax.numpy as jnp

    from laryngeal_tpu.data.native import decode_frames_auto
    from laryngeal_tpu.data.samplers import FrameSampler
    from laryngeal_tpu.preprocess import dct_wire as dw
    from laryngeal_tpu.preprocess.transforms import (batch_preprocess,
                                                     yuv420_to_rgb)
    from laryngeal_tpu.utils.compile_cache import enable as enable_cache

    enable_cache("/tmp/laryngeal_cc")
    crop, nf = bench.CROP, bench.NUM_FRAMES
    paths = bench.ensure_videos()[: args.clips]
    model, params = bench.build_model()

    sampler = FrameSampler("uniform", nf, seed=7)
    clips = np.stack([
        decode_frames_auto(p, sampler(str(p), 96), resize_to=(crop, crop),
                           fmt="i420")
        for p in paths])

    # params must travel as an ARGUMENT: a closed-over f32 ViViT-B tree
    # (~350 MB) would be baked into the HLO as constants and the relay's
    # remote-compile endpoint rejects the request body (HTTP 413).
    @jax.jit
    def probs_from_rgb(params, rgb):
        x = batch_preprocess(rgb, "vivit", train=False, crop=crop)
        return jax.nn.softmax(model.apply({"params": params}, x), -1)

    @jax.jit
    def rgb_lossless(yuv):
        return jax.vmap(lambda c: yuv420_to_rgb(c, crop, crop))(yuv)

    p_ref = np.asarray(probs_from_rgb(params, rgb_lossless(jnp.asarray(clips))))
    print(f"lossless reference: {len(paths)} clips, {nf}f {crop}x{crop}",
          flush=True)

    lowres_clips = {}  # level -> (B,T,hw*3/2,hw) reduced-geometry decodes

    def clips_at(level):
        if level == 0:
            return clips, crop
        if level not in lowres_clips:
            hw = crop >> level
            lowres_clips[level] = np.stack([
                decode_frames_auto(p, sampler(str(p), 96),
                                   resize_to=(hw, hw), fmt="i420",
                                   lowres=level)
                for p in paths])
        return lowres_clips[level], crop >> level

    for arm in args.arms.split(";"):
        fields = [int(v) for v in arm.strip().split(",")]
        q, k, pf = fields[:3]
        lvl = fields[3] if len(fields) > 3 else 0
        src, hw = clips_at(lvl)
        lvl_txt = f" lowres{lvl}({hw}px)" if lvl else ""
        if pf >= k:  # unpacked dct wire
            enc = [dw.encode_clip(c, q, k) for c in src]
            dc = np.stack([e[0] for e in enc])
            ac = np.stack([e[1] for e in enc])
            nbytes = dc[0].nbytes + ac[0].nbytes
            dec = jax.jit(jax.vmap(
                lambda d, a: dw.decode_to_rgb(d, a, hw, hw, q)))
            rgb = dec(jnp.asarray(dc), jnp.asarray(ac))
            planes = 2 + k
        else:
            enc = [dw.encode_clip_packed(c, q, k, pf) for c in src]
            dc = np.stack([e[0] for e in enc])
            hi = np.stack([e[1] for e in enc])
            pk = np.stack([e[2] for e in enc])
            nbytes = dc[0].nbytes + hi[0].nbytes + pk[0].nbytes
            dec = jax.jit(jax.vmap(
                lambda d, h, p: dw.decode_to_rgb_packed(
                    d, h, p, hw, hw, q, k)))
            rgb = dec(jnp.asarray(dc), jnp.asarray(hi), jnp.asarray(pk))
            planes = 2 + pf + (k - pf + 1) // 2
        p = np.asarray(probs_from_rgb(params, rgb))
        d = np.abs(p - p_ref)
        print(f"q{q:3d} keep{k:2d} pack{pf:2d}{lvl_txt}: "
              f"max drift {d.max():.4f}  mean {d.mean():.5f}  "
              f"{nbytes / 1e6:.3f} MB/clip  {planes} byte-planes/block",
              flush=True)


if __name__ == "__main__":
    main()
