"""Weight-layout manifest tests (VERDICT round-1 missing #1 / next #4).

Round 1 validated converters against state dicts synthesized from the
converters' own inverse rules — circular. These tests consume independent
manifests (laryngeal_tpu/compat/manifests.py, transcribed from torchvision /
pytorchvideo / ultralytics module definitions) and assert:

1. converting a manifest-shaped state dict yields EXACTLY the Flax
   ``model.init`` tree (key set + shapes) — catches converter<->library and
   converter<->model drift in one shot;
2. every manifest key is either consumed by the converter or in the
   documented ignorable set (buffers we recompute);
3. a renamed or reshaped real key FAILS (the round-1 gap: such drift passed).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import flax

from laryngeal_tpu.compat import manifests as MF
from laryngeal_tpu.compat.torch_port import port_resnet3d, port_swin3d, port_yolov5


class RecordingDict(dict):
    """Tracks which keys a converter actually reads."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.consumed = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)


def synth_state(manifest, seed=0):
    rng = np.random.default_rng(seed)
    out = RecordingDict()
    for key, shape in manifest.items():
        if MF.is_ignorable(key):
            out[key] = np.zeros(shape, np.int64)
        else:
            out[key] = rng.normal(0, 0.02, shape).astype(np.float32)
    return out


def flat_shapes(tree):
    return {k: tuple(np.asarray(v).shape)
            for k, v in flax.traverse_util.flatten_dict(tree, sep="/").items()}


def assert_trees_match(converted, init_tree, label):
    a, b = flat_shapes(converted), flat_shapes(init_tree)
    missing = sorted(set(b) - set(a))
    extra = sorted(set(a) - set(b))
    assert not missing and not extra, (
        f"{label}: tree mismatch\n missing from conversion: {missing[:8]}\n"
        f" unexpected in conversion: {extra[:8]}")
    bad = [(k, a[k], b[k]) for k in a if a[k] != b[k]]
    assert not bad, f"{label}: shape mismatches {bad[:8]}"


def assert_fully_consumed(state, label):
    unconsumed = {k for k in state if k not in state.consumed}
    not_ignorable = sorted(k for k in unconsumed if not MF.is_ignorable(k))
    assert not not_ignorable, (
        f"{label}: converter silently skipped real weights: {not_ignorable[:8]}")


# ---------- swin3d vs torchvision ----------

@pytest.mark.parametrize("size", ["tiny", "small", "base"])
def test_swin3d_manifest_matches_model(size):
    from laryngeal_tpu.models.swin3d import create_swin3d

    manifest = MF.swin3d_manifest(size, num_classes=400)
    state = synth_state(manifest)
    depths = MF.SWIN3D_SPECS[size]["depths"]
    converted = port_swin3d(state, depths=depths)

    model = create_swin3d(size, num_classes=400)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4, 32, 32, 3), jnp.float32))["params"]
    assert_trees_match(converted, init, f"swin3d_{size}")
    assert_fully_consumed(state, f"swin3d_{size}")


def test_swin3d_renamed_key_fails():
    manifest = MF.swin3d_manifest("tiny", num_classes=400)
    state = synth_state(manifest)
    # Simulate upstream layout drift: timm-style key name.
    state["features.0.0.attn.qkv_proj.weight"] = state.pop(
        "features.0.0.attn.qkv.weight")
    with pytest.raises(KeyError):
        port_swin3d(state, depths=(2, 2, 6, 2))


def test_swin3d_reshaped_key_fails():
    from laryngeal_tpu.models.swin3d import create_swin3d

    manifest = MF.swin3d_manifest("tiny", num_classes=400)
    state = synth_state(manifest)
    # Transposed qkv (wrong convention) must not silently pass.
    state["features.0.0.attn.qkv.weight"] = (
        state["features.0.0.attn.qkv.weight"].reshape(96, 288))
    converted = port_swin3d(state, depths=(2, 2, 6, 2))
    model = create_swin3d("tiny", num_classes=400)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4, 32, 32, 3), jnp.float32))["params"]
    with pytest.raises(AssertionError):
        assert_trees_match(converted, init, "swin3d_reshaped")


def test_validate_state_dict_reports_drift():
    manifest = MF.swin3d_manifest("tiny", num_classes=400)
    state = dict(synth_state(manifest))
    state["head.weight"] = state["head.weight"].T  # reshape
    del state["norm.bias"]  # missing
    state["totally.new.key"] = np.zeros((1,))  # extra
    missing, extra, mismatched = MF.validate_state_dict(state, manifest)
    assert missing == ["norm.bias"]
    assert extra == ["totally.new.key"]
    assert mismatched and mismatched[0][0] == "head.weight"


# ---------- resnet3d vs pytorchvideo ----------

def test_resnet3d_manifest_matches_model():
    from laryngeal_tpu.models.resnet3d import create_resnet3d

    manifest = MF.resnet3d_manifest(num_classes=2)
    state = synth_state(manifest)
    converted = port_resnet3d(state)

    model = create_resnet3d(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 64, 64, 3), jnp.float32))
    assert_trees_match(converted["params"], variables["params"], "resnet3d params")
    assert_trees_match(converted["batch_stats"], variables["batch_stats"],
                       "resnet3d batch_stats")
    assert_fully_consumed(state, "resnet3d")


def test_resnet3d_renamed_key_fails():
    manifest = MF.resnet3d_manifest(num_classes=2)
    state = synth_state(manifest)
    state["blocks.1.res_blocks.0.branch2.conv_a2.weight"] = state.pop(
        "blocks.1.res_blocks.0.branch2.conv_a.weight")
    with pytest.raises(KeyError):
        port_resnet3d(state)


# ---------- yolov5 vs ultralytics ----------

def test_yolov5_manifest_matches_model():
    from laryngeal_tpu.models.yolov5 import create_yolov5

    manifest = MF.yolov5_manifest("s", num_classes=1)
    state = synth_state(manifest)
    converted = port_yolov5(state, size="s", num_classes=1)

    model = create_yolov5("s", num_classes=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert_trees_match(converted["params"], variables["params"], "yolov5 params")
    assert_trees_match(converted["batch_stats"], variables["batch_stats"],
                       "yolov5 batch_stats")
    assert_fully_consumed(state, "yolov5")


def test_yolov5_manifest_matches_model_prefixed():
    """DetectMultiBackend exports carry a model. / model.model. prefix."""
    from laryngeal_tpu.models.yolov5 import create_yolov5

    manifest = MF.yolov5_manifest("s", num_classes=1, prefix="model.model.")
    state = synth_state(manifest)
    converted = port_yolov5(state, size="s", num_classes=1)
    model = create_yolov5("s", num_classes=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert_trees_match(converted["params"], variables["params"], "yolov5 prefixed")


def test_yolov5_reshaped_detect_fails():
    from laryngeal_tpu.models.yolov5 import create_yolov5

    manifest = MF.yolov5_manifest("s", num_classes=1)
    state = synth_state(manifest)
    state["model.24.m.0.weight"] = np.zeros((21, 128, 1, 1), np.float32)  # nc=2
    converted = port_yolov5(state, size="s", num_classes=1)
    model = create_yolov5("s", num_classes=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    with pytest.raises(AssertionError):
        assert_trees_match(converted["params"], variables["params"], "yolo nc")
