"""Preprocessing parity tests vs torch reference semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.preprocess import transforms as T


def make_clip(t=4, h=120, w=160, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (t, h, w, 3), dtype=np.uint8)


def test_normalize_constants():
    clip = make_clip()
    out = T.normalize(jnp.asarray(clip))
    expected = (clip.astype(np.float32) / 255.0 - 0.45) / 0.225
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-6)


def test_eval_transform_matches_torch_interpolate_centercrop():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    clip = make_clip(t=2, h=120, w=160)
    out = T.pytorchvideo_eval(jnp.asarray(clip), crop=64, size=96)

    # Torch reference: interpolate short side to 96 (bilinear, no antialias),
    # then center crop 64, then normalize.
    x = torch.from_numpy(clip.astype(np.float32)).permute(0, 3, 1, 2)  # T,C,H,W
    f = 96 / min(120, 160)
    new_h, new_w = int(120 * f), int(160 * f)
    x = F.interpolate(x, size=(new_h, new_w), mode="bilinear", align_corners=False)
    top = (new_h - 64) // 2
    left = (new_w - 64) // 2
    x = x[:, :, top : top + 64, left : left + 64]
    x = (x / 255.0 - 0.45) / 0.225
    expected = x.permute(0, 2, 3, 1).numpy()

    # Torch crops the materialized scaled image at integer offsets; our fused
    # gather uses the exact fractional center. For even sizes they coincide.
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-2, rtol=1e-3)


def test_train_transform_shapes_and_range():
    clip = make_clip(t=3, h=300, w=400)
    key = jax.random.PRNGKey(0)
    out = T.pytorchvideo_train(jnp.asarray(clip), key)
    assert out.shape == (3, 224, 224, 3)
    # Normalized range for uint8 input: [(0-.45)/.225, (1-.45)/.225] = [-2, 2.44]
    assert float(out.min()) >= -2.01 and float(out.max()) <= 2.5


def test_train_transform_randomness_and_determinism():
    clip = jnp.asarray(make_clip(t=2, h=300, w=400))
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    a1 = T.pytorchvideo_train(clip, k1)
    a1b = T.pytorchvideo_train(clip, k1)
    a2 = T.pytorchvideo_train(clip, k2)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a1b))
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_hflip():
    clip = jnp.asarray(make_clip(t=1, h=8, w=8))
    flipped = T.random_hflip(clip.astype(jnp.float32), jax.random.PRNGKey(0), p=1.0)
    np.testing.assert_array_equal(np.asarray(flipped), np.asarray(clip)[:, :, ::-1, :])
    same = T.random_hflip(clip.astype(jnp.float32), jax.random.PRNGKey(0), p=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(clip))


def test_vivit_pixels_matches_hf_processor():
    transformers = pytest.importorskip("transformers")
    from transformers import VivitImageProcessor

    clip = make_clip(t=2, h=224, w=224)  # reference feeds 224x224 uint8
    proc = VivitImageProcessor()
    expected = proc([f for f in clip], return_tensors="np").pixel_values[0]  # (T,C,H,W)
    expected = np.transpose(expected, (0, 2, 3, 1))

    out = np.asarray(T.vivit_pixels(jnp.asarray(clip)))
    # PIL vs jax bilinear resampling differ slightly at pixel level.
    assert out.shape == expected.shape
    err = np.abs(out - expected)
    assert err.mean() < 0.03, err.mean()
    assert np.quantile(err, 0.99) < 0.2


def test_timesformer_pixels_matches_hf_processor():
    transformers = pytest.importorskip("transformers")
    from transformers import VideoMAEImageProcessor

    clip = make_clip(t=2, h=224, w=224)
    proc = VideoMAEImageProcessor()
    expected = proc([f for f in clip], return_tensors="np").pixel_values[0]
    expected = np.transpose(expected, (0, 2, 3, 1))
    out = np.asarray(T.timesformer_pixels(jnp.asarray(clip)))
    # size==crop==224 on 224 input: resize+crop are identity -> exact affine.
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_batch_preprocess_dispatch():
    clips = jnp.asarray(make_clip(t=2, h=120, w=160)[None].repeat(2, axis=0))
    out = T.batch_preprocess(clips, "pytorchvideo", train=True, key=jax.random.PRNGKey(0))
    assert out.shape == (2, 2, 224, 224, 3)
    # Per-sample augmentation keys differ.
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
    out_eval = T.batch_preprocess(clips, "vivit", train=False)
    assert out_eval.shape == (2, 2, 224, 224, 3)
    with pytest.raises(ValueError):
        T.batch_preprocess(clips, "nope", train=False)
    with pytest.raises(ValueError):
        T.batch_preprocess(clips, "pytorchvideo", train=True, key=None)


def test_temporal_delta_roundtrip_exact():
    """Wire-format inverse: host mod-256 deltas -> device scan, bit-exact."""
    rng = np.random.default_rng(9)
    clip = rng.integers(0, 256, (6, 12, 8), dtype=np.uint8)  # I420-ish planes
    enc = T.temporal_delta_encode(clip)
    assert enc.dtype == np.uint8
    np.testing.assert_array_equal(enc[0], clip[0])
    dec = jax.jit(lambda x: T.temporal_delta_decode(x, axis=0))(jnp.asarray(enc))
    np.testing.assert_array_equal(np.asarray(dec), clip)

    # Batched with the frame axis at 1 (the bench layout).
    batch = rng.integers(0, 256, (3, 5, 6, 4), dtype=np.uint8)
    enc_b = np.stack([T.temporal_delta_encode(c) for c in batch])
    dec_b = jax.jit(lambda x: T.temporal_delta_decode(x, axis=1))(jnp.asarray(enc_b))
    np.testing.assert_array_equal(np.asarray(dec_b), batch)
