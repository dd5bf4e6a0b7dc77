"""W8A8 dynamic quantization: tree transform, interception, accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
from laryngeal_tpu.ops import quant


def _tiny_vivit():
    cfg = VivitConfig(hidden_size=256, num_layers=2, num_heads=4,
                      intermediate_size=512, image_size=32, num_frames=4)
    model = VivitForVideoClassification(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3)) * 50 + 100
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    return model, params, x


def test_quantize_kernel_roundtrip():
    k = jax.random.normal(jax.random.PRNGKey(2), (256, 128))
    q, s = quant.quantize_kernel(k)
    assert q.dtype == jnp.int8 and s.shape == (128,)
    deq = q.astype(jnp.float32) * s[None, :]
    # Symmetric per-channel int8: max error is half a quantization step.
    np.testing.assert_allclose(np.asarray(deq), np.asarray(k),
                               atol=float(s.max()) * 0.5 + 1e-7)


def test_quantize_params_selects_and_excludes():
    _, params, _ = _tiny_vivit()
    qparams, paths = quant.quantize_params(params)
    # Transformer qkv/out/mlp Dense kernels quantized...
    assert any("attention" in "/".join(p) for p in paths)
    assert any("mlp" in "/".join(p) for p in paths)
    # ...classifier (excluded name AND narrow dim) untouched.
    assert ("classifier",) not in paths
    assert qparams["classifier"]["kernel"].dtype == jnp.float32
    layer = qparams["layer_0"]["attention"]["query"]
    assert set(layer) == {"kernel_q8", "kernel_scale", "bias"}
    assert layer["kernel_q8"].dtype == jnp.int8
    # Conv kernels (embeddings projection, >2-D) untouched.
    assert qparams["embeddings"]["projection"]["kernel"].ndim == 5


def test_quantized_apply_close_to_f32():
    model, params, x = _tiny_vivit()
    ref = jax.nn.softmax(model.apply({"params": params}, x), axis=-1)
    qparams, paths = quant.quantize_params(params)
    got = jax.nn.softmax(
        quant.quantized_apply(model, {"params": qparams}, x,
                              quantized_paths=paths), axis=-1)
    # W8A8 dynamic on a random-init model: probabilities track closely.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.05)
    assert (np.argmax(np.asarray(got), -1) == np.argmax(np.asarray(ref), -1)).all()


def test_quantized_apply_infers_paths_and_jits():
    model, params, x = _tiny_vivit()
    qparams, paths = quant.quantize_params(params)

    @jax.jit
    def f(variables, x):
        return quant.quantized_apply(model, variables, x,
                                     quantized_paths=paths)

    a = f({"params": qparams}, x)
    b = quant.quantized_apply(model, {"params": qparams}, x)  # inferred paths
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_interceptor_leaves_unquantized_models_alone():
    model, params, x = _tiny_vivit()
    ref = model.apply({"params": params}, x)
    got = quant.quantized_apply(model, {"params": params}, x,
                                quantized_paths=frozenset())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_quantized_apply_swin3d():
    """W8A8 applies to Swin3D's qkv/proj/mlp Dense layers through the same
    interceptor (path matching is model-agnostic)."""
    from laryngeal_tpu.models.swin3d import create_swin3d

    model = create_swin3d("tiny", num_classes=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 32, 32, 3)) * 40
    params = model.init(jax.random.PRNGKey(1), x, train=False)["params"]
    qparams, paths = quant.quantize_params(params)
    assert any("attn" in "/".join(p) for p in paths)      # qkv/proj quantized
    assert ("head",) not in paths                          # head excluded
    ref = jax.nn.softmax(model.apply({"params": params}, x, train=False))
    got = jax.nn.softmax(quant.quantized_apply(
        model, {"params": qparams}, x, train=False, quantized_paths=paths))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.05)


def test_conv_weight_quantization_roundtrip_resnet3d():
    """Weight-only int8 conv kernels (round-2 VERDICT weak #7): the conv
    families now shrink too. Dequantize-at-apply keeps compute f32."""
    from laryngeal_tpu.models.resnet3d import create_resnet3d

    model = create_resnet3d(num_classes=2, stage_sizes=(1, 1, 1, 1))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 32, 32, 3)) * 40 + 100
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    qparams, conv_paths = quant.quantize_conv_kernels(params, min_elems=256)
    assert conv_paths, "no conv kernels quantized"
    # Stem conv got replaced by the q8 pair.
    assert qparams["stem_conv"]["kernel_q8"].dtype == jnp.int8
    assert "kernel" not in qparams["stem_conv"]
    # proj head excluded by... name? 'proj' is not on the exclude list but is
    # a 2-D Dense kernel -> conv pass skips ndim<3.
    assert "kernel" in qparams["proj"]

    deq = quant.dequantize_conv_kernels(qparams)
    k0 = np.asarray(params["stem_conv"]["kernel"])
    k1 = np.asarray(deq["stem_conv"]["kernel"])
    step = np.abs(k0).max() / 127.0
    np.testing.assert_allclose(k1, k0, atol=step * 0.51 + 1e-7)

    ref = jax.nn.softmax(model.apply(
        {"params": params, "batch_stats": stats}, x, train=False))
    got = jax.nn.softmax(quant.quantized_apply(
        model, {"params": qparams, "batch_stats": stats}, x, train=False,
        quantized_paths=frozenset()))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.05)


def test_conv_quantization_threshold_and_exclusion():
    from laryngeal_tpu.models.resnet3d import create_resnet3d

    model = create_resnet3d(num_classes=2, stage_sizes=(1, 1, 1, 1))
    x = jnp.zeros((1, 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x, train=False)["params"]
    _, none_paths = quant.quantize_conv_kernels(params, min_elems=10**9)
    assert not none_paths  # threshold gates everything out


def test_full_int8_pipeline_all_families_size_and_drift():
    """Per-family artifact-byte accounting + probability drift for the FULL
    int8 path (Dense W8A8 + conv weight-only). Every family's quantized
    param bytes must be <= 0.5x f32 at bounded drift."""
    from laryngeal_tpu.models.registry import get_model_spec
    from laryngeal_tpu.models.resnet3d import create_resnet3d
    from laryngeal_tpu.models.resnet import create_resnet50_lstm
    from laryngeal_tpu.models.swin3d import create_swin3d
    from laryngeal_tpu.models.timesformer import (TimesformerConfig,
                                                  TimesformerForVideoClassification)

    def nbytes(tree):
        return sum(np.asarray(v).nbytes for v in jax.tree_util.tree_leaves(tree))

    cases = {
        "vivit": _tiny_vivit()[0],
        "timesformer": TimesformerForVideoClassification(TimesformerConfig(
            hidden_size=256, num_layers=2, num_heads=4, intermediate_size=512,
            image_size=32, num_frames=4, num_classes=2)),
        "swin3d": create_swin3d("tiny", num_classes=2),
        "resnet3d": create_resnet3d(num_classes=2, stage_sizes=(1, 1, 1, 1)),
        "resnet50_lstm": create_resnet50_lstm(stage_sizes=(1, 1, 1, 1)),
    }
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 32, 32, 3)) * 40 + 100
    for name, model in cases.items():
        variables = dict(model.init(jax.random.PRNGKey(1), x, train=False))
        params = variables["params"]
        qparams, dense_paths = quant.quantize_params(params)
        qparams, conv_paths = quant.quantize_conv_kernels(qparams,
                                                          min_elems=256)
        assert dense_paths or conv_paths, f"{name}: nothing quantized"
        ratio = nbytes(qparams) / nbytes(params)
        assert ratio <= 0.5, f"{name}: int8 params {ratio:.2f}x f32"

        ref = jax.nn.softmax(model.apply(variables, x, train=False))
        got = jax.nn.softmax(quant.quantized_apply(
            model, dict(variables, params=qparams), x, train=False,
            quantized_paths=dense_paths))
        drift = float(np.abs(np.asarray(got) - np.asarray(ref)).max())
        assert drift < 0.06, f"{name}: prob drift {drift}"
