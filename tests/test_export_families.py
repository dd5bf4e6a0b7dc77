"""AOT export round-trip for ALL FIVE model families (round-3 VERDICT #3).

tests/test_export.py exercises the full CLI surface on ViViT; this module
pins the part that can actually break per family: `jax.export`
serialization of each family's inference graph — BatchNorm variable trees
(resnet3d, resnet50_lstm), the LSTM `lax.scan` carry, swin's rolls +
window partitioning — and the artifact's numeric round-trip against the
live Predictor at pinned drift for f32 / bf16 / int8 weights.

Reference contract being replaced: each family's checkpoint→predict loop
(`resnet50-3d-video/inference.py:47-63`,
`videoswintransformer/inference.py:339-357`).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.infer.export import (
    ExportedModel, ExportedPredictor, export_predictor, save_exported)
from laryngeal_tpu.infer.predictor import Predictor
from laryngeal_tpu.models.registry import get_model_spec
from laryngeal_tpu.train.state import create_train_state

FAMILIES = ["vivit", "timesformer", "swin3d", "resnet3d", "resnet50_lstm"]

T, HW = 4, 64


def _tiny_model(family):
    if family == "vivit":
        from laryngeal_tpu.models.vivit import (
            VivitConfig, VivitForVideoClassification)

        return VivitForVideoClassification(VivitConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=HW, num_frames=T, num_classes=2))
    if family == "timesformer":
        from laryngeal_tpu.models.timesformer import (
            TimesformerConfig, TimesformerForVideoClassification)

        return TimesformerForVideoClassification(TimesformerConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=HW, num_frames=T, num_classes=2))
    if family == "swin3d":
        from laryngeal_tpu.models.swin3d import Swin3DConfig, SwinTransformer3D

        # Two stages so PatchMerging + the shifted-window roll both
        # serialize; window (2,2,2) shifts by (1,1,1).
        return SwinTransformer3D(Swin3DConfig(
            embed_dim=16, depths=(1, 1), num_heads=(2, 4), window=(2, 2, 2),
            patch_size=(2, 4, 4), num_classes=2))
    if family == "resnet3d":
        from laryngeal_tpu.models.resnet3d import create_resnet3d

        return create_resnet3d(num_classes=2, stage_sizes=(1, 1, 1, 1))
    if family == "resnet50_lstm":
        from laryngeal_tpu.models.resnet import create_resnet50_lstm

        return create_resnet50_lstm(hidden_size=32, num_layers=2,
                                    stage_sizes=(1, 1, 1, 1))
    raise ValueError(family)


@pytest.fixture(scope="module", params=FAMILIES)
def live(request):
    family = request.param
    spec = get_model_spec(family)
    model = _tiny_model(family)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, T, HW, HW, 3), jnp.float32),
        optimizer=spec.optimizer, learning_rate=1e-3, weight_decay=0.01)
    predictor = Predictor(model, spec, state, num_frames=T, crop_size=HW)
    rng = np.random.default_rng(17)
    clips = rng.integers(0, 256, (2, T, HW, HW, 3), dtype=np.uint8)
    return family, predictor, clips, np.asarray(predictor.predict_clip(clips))


def _roundtrip(predictor, tmp_path, name, **kw):
    art = export_predictor(predictor, batch_sizes=(2,), **kw)
    path = save_exported(art, tmp_path / f"{name}.lxa")
    return ExportedModel.load(path), path


def test_export_f32_roundtrip(live, tmp_path):
    """f32 artifact reproduces the live predictor to fp tolerance."""
    family, predictor, clips, ref = live
    exported, path = _roundtrip(predictor, tmp_path, f"{family}_f32")
    np.testing.assert_allclose(exported.predict(clips), ref, atol=1e-5,
                               err_msg=family)
    assert path.stat().st_size > 0


def test_export_bf16_roundtrip(live, tmp_path):
    family, predictor, clips, ref = live
    exported, _ = _roundtrip(predictor, tmp_path, f"{family}_bf16",
                             weights_dtype="bf16")
    assert exported.meta["weights_dtype"] == "bf16"
    probs = exported.predict(clips)
    np.testing.assert_allclose(probs, ref, atol=0.05, err_msg=family)
    assert (np.argmax(probs, -1) == np.argmax(ref, -1)).all()


def test_export_int8_roundtrip(live, tmp_path):
    family, predictor, clips, ref = live
    exported, _ = _roundtrip(predictor, tmp_path, f"{family}_int8",
                             quantize="int8")
    assert exported.meta["quantize"] == "int8"
    probs = exported.predict(clips)
    np.testing.assert_allclose(probs, ref, atol=0.08, err_msg=family)
    assert (np.argmax(probs, -1) == np.argmax(ref, -1)).all()


def test_export_args_mode_roundtrip(live, tmp_path):
    """weights_mode='args': weights ride the artifact ONCE (graphs take
    them as inputs), every family round-trips at fp tolerance, and a
    multi-batch-size artifact stops paying the weight bytes per graph."""
    family, predictor, clips, ref = live
    exported, path = _roundtrip(predictor, tmp_path, f"{family}_args",
                                weights_mode="args")
    assert exported.meta["weights_mode"] == "args"
    np.testing.assert_allclose(exported.predict(clips), ref, atol=1e-5,
                               err_msg=family)
    # Multi-bucket size law: baked pays ~weights per graph, args ~once.
    art_b = export_predictor(predictor, batch_sizes=(1, 2, 4, 8))
    art_a = export_predictor(predictor, batch_sizes=(1, 2, 4, 8),
                             weights_mode="args")
    size_b = save_exported(art_b, tmp_path / "b4.lxa").stat().st_size
    size_a = save_exported(art_a, tmp_path / "a4.lxa").stat().st_size
    assert size_a < 0.55 * size_b, (family, size_a, size_b)
    got = ExportedModel.load(tmp_path / "a4.lxa").predict(clips)
    np.testing.assert_allclose(got, ref, atol=1e-5, err_msg=family)


def test_export_args_mode_composes_with_int8(live, tmp_path):
    """weights_mode='args' + quantize='int8': the staged weight leaves are
    the QUANTIZED tree (int8 kernels + scales ride the artifact, not f32 —
    quantize_params rewrites params before the flatten at export.py), so
    the int8 size win survives args mode; probs at int8 tolerance."""
    family, predictor, clips, ref = live
    exported, path = _roundtrip(predictor, tmp_path, f"{family}_args_q8",
                                weights_mode="args", quantize="int8")
    assert exported.meta["weights_mode"] == "args"
    assert exported.meta["quantize"] == "int8"
    probs = exported.predict(clips)
    np.testing.assert_allclose(probs, ref, atol=0.08, err_msg=family)
    assert (np.argmax(probs, -1) == np.argmax(ref, -1)).all()
    # When the quantizer found eligible layers (the tiny swin3d's 16-dim
    # Denses are all below _MIN_DIM — correctly skipped), the STAGED leaves
    # must be the quantized tree: int8 in the manifest and fewer stored
    # bytes than the f32 args artifact.
    from laryngeal_tpu.ops.quant import quantize_params

    _, quant_paths = quantize_params(predictor.state.params)
    if quant_paths:
        manifest = exported.meta["weights_manifest"]
        assert any(e["dtype"] == "int8" for e in manifest), family
        _, path_f32 = _roundtrip(predictor, tmp_path,
                                 f"{family}_args_f32ref",
                                 weights_mode="args")
        assert path.stat().st_size < path_f32.stat().st_size, family


def test_exported_predictor_video_path(live, tmp_path):
    """ExportedPredictor (no model code, artifact bytes only) serves a real
    video for every family and matches the live predictor's class + probs."""
    cv2 = pytest.importorskip("cv2")
    from laryngeal_tpu.data.synthetic import synth_video
    from laryngeal_tpu.data.video import write_video

    family, predictor, _, _ = live
    video = tmp_path / "clip.mp4"
    frames = synth_video(np.random.default_rng(3), 9, HW, HW, referral=True)
    write_video(str(video), frames)
    _, path = _roundtrip(predictor, tmp_path, f"{family}_pv")
    ep = ExportedPredictor.load(path)
    r_live = predictor.predict_video(str(video))
    r_art = ep.predict_video(str(video))
    assert r_art["frame_indices"] == r_live["frame_indices"], family
    assert r_art["predicted_class"] == r_live["predicted_class"], family
    np.testing.assert_allclose(
        list(r_art["probabilities"].values()),
        list(r_live["probabilities"].values()), atol=1e-5, err_msg=family)


def test_future_format_version_rejected(tmp_path):
    """Forward-compat contract of ``_FORMAT_VERSION``: an artifact written
    by a NEWER exporter fails loudly at load — before any graph
    deserialization or platform probing — instead of surfacing a cryptic
    jax.export error (or silently ignoring w{K}.raw weight leaves it
    doesn't understand, which would bake garbage into args-mode calls)."""
    import json
    import zipfile

    from laryngeal_tpu.infer import export as ex

    p = tmp_path / "future.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("meta.json", json.dumps(
            {"format_version": ex._FORMAT_VERSION + 1}))
        zf.writestr("b1.bin", b"not a serialized graph")
    with pytest.raises(ValueError, match="newer than"):
        ExportedModel.load(p)
