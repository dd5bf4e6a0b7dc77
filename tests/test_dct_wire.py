"""DCT wire format (preprocess/dct_wire.py + native clip_dct_encode).

The wire is deliberately lossy (quantized transform coding so the
host->device link's content compression sees zero runs); these tests pin
the contract: exact geometry, native==numpy encoder parity, device==host
decoder parity, bounded reconstruction error, and bounded model-probability
drift vs the lossless path.
"""

import numpy as np
import pytest

from laryngeal_tpu.preprocess import dct_wire as dw


def _synth_i420(t=8, h=64, w=64, seed=0):
    from laryngeal_tpu.data.synthetic import synth_video
    from laryngeal_tpu.data.video import rgb_to_yuv420

    rgb = synth_video(np.random.default_rng(seed), t, h, w, referral=True)
    return rgb_to_yuv420(rgb)


def test_quant_table_q50_is_base():
    assert np.array_equal(dw.quant_table(dw.JPEG_LUMA_Q50, 50),
                          dw.JPEG_LUMA_Q50)


def test_quant_table_monotone_quality():
    q90 = dw.quant_table(dw.JPEG_LUMA_Q50, 90)
    q30 = dw.quant_table(dw.JPEG_LUMA_Q50, 30)
    assert (q90 <= q30).all() and q90.min() >= 1 and q30.max() <= 255


def test_geometry_and_shapes():
    clip = _synth_i420()
    dc, ac = dw.encode_clip_np(clip, 87)
    nby, nbc, nb = dw.block_geometry(64, 64)
    assert nby == 64 and nbc == 16 and nb == 96
    assert dc.shape == (8, 96) and dc.dtype == np.int16
    assert ac.shape == (63, 8, 96) and ac.dtype == np.int8
    with pytest.raises(ValueError):
        dw.block_geometry(60, 64)


@pytest.mark.parametrize("quality,psnr_floor,maxerr_cap", [
    (90, 33.0, 48), (75, 29.0, 64)])
def test_roundtrip_bounded_loss(quality, psnr_floor, maxerr_cap):
    clip = _synth_i420(t=12)
    dc, ac = dw.encode_clip_np(clip, quality)
    rec = dw.decode_clip_np(dc, ac, 64, 64, quality)
    err = rec.astype(np.float32) - clip.astype(np.float32)
    psnr = 10 * np.log10(255.0 ** 2 / max(float((err ** 2).mean()), 1e-9))
    assert psnr > psnr_floor, psnr
    assert np.abs(err).max() <= maxerr_cap


def test_zigzag_is_a_permutation():
    assert sorted(dw.ZIGZAG.tolist()) == list(range(64))
    assert dw.ZIGZAG[0] == 0


def test_ac_truncation_roundtrip():
    """keep_ac=31 ships half the AC payload; reconstruction must equal the
    full encode decoded with the trailing planes zeroed, and stay within a
    PSNR floor of the untruncated decode."""
    clip = _synth_i420(t=10, seed=9)
    dc, ac_full = dw.encode_clip_np(clip, 75)
    dc31, ac31 = dw.encode_clip_np(clip, 75, keep_ac=31)
    np.testing.assert_array_equal(ac31, ac_full[:31])
    np.testing.assert_array_equal(dc31, dc)
    rec31 = dw.decode_clip_np(dc31, ac31, 64, 64, 75)
    rec_full = dw.decode_clip_np(dc, ac_full, 64, 64, 75)
    err31 = rec31.astype(np.float32) - clip.astype(np.float32)
    err_full = rec_full.astype(np.float32) - clip.astype(np.float32)
    psnr31 = 10 * np.log10(255.0 ** 2 / float((err31 ** 2).mean()))
    psnr_full = 10 * np.log10(255.0 ** 2 / float((err_full ** 2).mean()))
    assert psnr31 > psnr_full - 2.0, (psnr31, psnr_full)
    # device decode accepts the truncated planes too
    rgb = np.asarray(dw.decode_to_rgb(dc31, ac31, 64, 64, 75))
    assert rgb.shape == (10, 64, 64, 3)


def test_native_encoder_matches_numpy():
    from laryngeal_tpu.data import native

    if not (native.available() and hasattr(native, "dct_encode")):
        pytest.skip("native cliploader without clip_dct_encode")
    clip = _synth_i420(t=6, seed=3)
    dc_n, ac_n = native.dct_encode(clip, 87)
    dc_p, ac_p = dw.encode_clip_np(clip, 87)
    # float accumulation order differs (8x8 two-pass vs 64-wide dot), so a
    # tiny fraction of coefficients lands on the other side of a rounding
    # boundary — bounded to +-1 and rare (measured ~5e-4 on real clips).
    d_dc = np.abs(dc_n.astype(np.int32) - dc_p.astype(np.int32))
    d_ac = np.abs(ac_n.astype(np.int32) - ac_p.astype(np.int32))
    assert d_dc.max() <= 1 and d_ac.max() <= 1
    frac = (np.count_nonzero(d_dc) + np.count_nonzero(d_ac)) / (
        d_dc.size + d_ac.size)
    assert frac < 2e-3, frac


def test_device_decode_matches_host_reference():
    from laryngeal_tpu.preprocess.transforms import yuv420_to_rgb

    clip = _synth_i420(t=6, seed=5)
    dc, ac = dw.encode_clip_np(clip, 87)
    rgb_dev = np.asarray(dw.decode_to_rgb(dc, ac, 64, 64, 87))
    i420_host = dw.decode_clip_np(dc, ac, 64, 64, 87)
    rgb_host = np.asarray(yuv420_to_rgb(i420_host, 64, 64))
    # Both round the reconstructed planes to integer levels before the same
    # BT.601 expansion; ulp differences in the IDCT can flip a rounding on
    # rare boundary pixels (then the 2.017 chroma gain scales it).
    assert np.abs(rgb_dev - rgb_host).max() <= 2.5
    exact = np.mean(np.abs(rgb_dev - rgb_host) < 1e-3)
    assert exact > 0.995, exact


def test_decode_is_jittable_and_batched():
    import jax

    clip = _synth_i420(t=4, seed=7)
    dc, ac = dw.encode_clip_np(clip, 87)
    dcs = np.stack([dc, dc])
    acs = np.stack([ac, ac])
    out = jax.jit(jax.vmap(lambda d, a: dw.decode_to_rgb(d, a, 64, 64, 87)))(
        dcs, acs)
    assert out.shape == (2, 4, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_model_probability_drift_is_small():
    """Drift of softmax probabilities through a ViViT forward when the clip
    rides the dct wire instead of the lossless one. The bound is loose (the
    synthetic clip is deliberately noise-heavy); the operating-point number
    on real decode output is measured in the bench wire A/B."""
    import jax
    import jax.numpy as jnp

    from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
    from laryngeal_tpu.preprocess.transforms import (batch_preprocess,
                                                     yuv420_to_rgb)

    clip = _synth_i420(t=4, h=64, w=64, seed=11)
    cfg = VivitConfig(hidden_size=32, num_layers=2, num_heads=2,
                      intermediate_size=64, image_size=64, num_frames=4,
                      num_classes=2, tubelet_size=(2, 16, 16))
    model = VivitForVideoClassification(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, 64, 64, 3)))["params"]

    def probs(rgb):
        x = batch_preprocess(rgb[None], "vivit", train=False, crop=64)
        return jax.nn.softmax(model.apply({"params": params}, x), -1)

    p_raw = np.asarray(probs(yuv420_to_rgb(clip, 64, 64)))
    dc, ac = dw.encode_clip_np(clip, 87)
    p_dct = np.asarray(probs(dw.decode_to_rgb(dc, ac, 64, 64, 87)))
    assert np.abs(p_raw - p_dct).max() < 0.05, (p_raw, p_dct)


def test_pack_ac_planes_roundtrip_and_shapes():
    clip = _synth_i420(t=4, seed=13)
    dc, ac = dw.encode_clip_np(clip, 75, 31)
    hi8, pk = dw.pack_ac_planes(ac, 14)
    assert hi8.shape == (14,) + ac.shape[1:] and hi8.dtype == np.int8
    assert pk.shape == ((31 - 14 + 1) // 2,) + ac.shape[1:]
    assert pk.dtype == np.uint8
    un = dw.unpack_ac_planes(hi8, pk, 31)
    clamped = np.concatenate(
        [ac[:14], np.clip(ac[14:].astype(np.int16), -8, 7).astype(np.int8)])
    np.testing.assert_array_equal(un, clamped)
    # pack_from >= K degenerates to the unpacked wire
    hi_all, pk_none = dw.pack_ac_planes(ac, 99)
    np.testing.assert_array_equal(hi_all, ac)
    assert pk_none.shape[0] == 0
    np.testing.assert_array_equal(dw.unpack_ac_planes(hi_all, pk_none, 31), ac)
    # pack_from 0 packs everything (odd count -> implicit zero pad plane)
    hi_none, pk_all = dw.pack_ac_planes(ac, 0)
    assert hi_none.shape[0] == 0 and pk_all.shape[0] == 16
    np.testing.assert_array_equal(
        dw.unpack_ac_planes(hi_none, pk_all, 31),
        np.clip(ac.astype(np.int16), -8, 7).astype(np.int8))


def test_native_ac_pack_matches_numpy():
    from laryngeal_tpu.data import native

    if not (native.available() and hasattr(native, "ac_pack")):
        pytest.skip("native ac_pack unavailable")
    rng = np.random.default_rng(3)
    # full int8 range exercises the clamp on both sides, odd plane count
    # exercises the implicit zero pad
    ac = rng.integers(-128, 128, (17, 4, 96)).astype(np.int8)
    got = native.ac_pack(ac)
    r = np.clip(ac.astype(np.int16), -8, 7)
    r = np.concatenate([r, np.zeros((1,) + r.shape[1:], np.int16)])
    ref = ((r[0::2] & 15) | ((r[1::2] & 15) << 4)).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_packed_device_decode_matches_clamped_full_decode():
    clip = _synth_i420(t=4, seed=17)
    dc, ac = dw.encode_clip_np(clip, 75, 31)
    hi8, pk = dw.pack_ac_planes(ac, 14)
    rgb_packed = np.asarray(
        dw.decode_to_rgb_packed(dc, hi8, pk, 64, 64, 75, 31))
    clamped = np.concatenate(
        [ac[:14], np.clip(ac[14:].astype(np.int16), -8, 7).astype(np.int8)])
    rgb_full = np.asarray(dw.decode_to_rgb(dc, clamped, 64, 64, 75))
    np.testing.assert_array_equal(rgb_packed, rgb_full)


def test_packed_wire_extra_drift_is_negligible():
    """The packed wire's only extra loss vs dct is the [-8,7] clamp on
    planes >= pack_from; at q75/pack14 the clamped fraction on real content
    is ~2e-4 (BASELINE.md plane stats) and even on synthetic noise the pixel
    drift it adds over the unpacked dct wire stays tiny."""
    clip = _synth_i420(t=4, seed=19)
    dc, ac = dw.encode_clip_np(clip, 75, 31)
    hi8, pk = dw.pack_ac_planes(ac, 14)
    rgb_dct = np.asarray(dw.decode_to_rgb(dc, ac, 64, 64, 75))
    rgb_pk = np.asarray(dw.decode_to_rgb_packed(dc, hi8, pk, 64, 64, 75, 31))
    # noise content clamps ~6% of packed-plane values; real video ~2e-4.
    # Even so the added error is bounded by the clamp magnitude x quant step.
    assert np.abs(rgb_pk - rgb_dct).mean() < 2.0
    assert np.abs(rgb_pk - rgb_dct).max() < 80.0
