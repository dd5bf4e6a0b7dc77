"""Structural roundtrip tests for the swin3d / resnet3d converters.

torchvision and pytorchvideo are absent offline, so these synthesize a
state dict in their documented key layout (shapes derived from our flax
init by inverse-transforming the conversion rules) and require the
converter to reproduce the init tree exactly. This pins the converter
mechanics and our layer naming; key-layout fidelity against the real
packages is validated the first time real weights are ported.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.compat.torch_port import port_resnet3d, port_swin3d


def _fake_torch_tensors(flax_params, rules):
    """Build {torch_key: ndarray} whose conversion reproduces flax_params."""
    import flax as flax_lib

    flat = flax_lib.traverse_util.flatten_dict(flax_params, sep="/")
    out = {}
    rng = np.random.default_rng(0)
    for fkey, val in flat.items():
        tkey, transform = rules(fkey)
        if tkey is None:
            continue
        v = np.asarray(rng.normal(0, 0.05, val.shape).astype(np.float32))
        out[tkey] = transform(v)
        flat[fkey] = v
    return out, flax_lib.traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()})


def test_port_swin3d_roundtrip():
    from laryngeal_tpu.models.swin3d import Swin3DConfig, SwinTransformer3D

    depths = (1, 1)
    cfg = Swin3DConfig(embed_dim=8, depths=depths, num_heads=(2, 2),
                       window=(2, 2, 2), patch_size=(2, 4, 4), num_classes=2)
    model = SwinTransformer3D(cfg)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4, 16, 16, 3)))["params"]

    def rules(fkey):
        parts = fkey.split("/")
        inv_linear = lambda v: v.T
        inv_conv3d = lambda v: v.transpose(4, 3, 0, 1, 2)
        ident = lambda v: v
        if parts[0] == "patch_embed_proj":
            return ("patch_embed.proj." + ("weight" if parts[1] == "kernel" else "bias"),
                    inv_conv3d if parts[1] == "kernel" else ident)
        if parts[0] == "patch_embed_norm":
            return ("patch_embed.norm." + ("weight" if parts[1] == "scale" else "bias"), ident)
        if parts[0] == "norm":
            return ("norm." + ("weight" if parts[1] == "scale" else "bias"), ident)
        if parts[0] == "head":
            return ("head." + ("weight" if parts[1] == "kernel" else "bias"),
                    inv_linear if parts[1] == "kernel" else ident)
        if parts[0].startswith("merge"):
            s = int(parts[0][5:])
            mod = "norm" if parts[1] == "norm" else "reduction"
            name = {"scale": "weight", "bias": "bias", "kernel": "weight"}[parts[2]]
            return (f"features.{2 * s - 1}.{mod}.{name}",
                    inv_linear if parts[2] == "kernel" else ident)
        if parts[0].startswith("stage"):
            stage = int(parts[0][5]) - 1
            block = int(parts[0].split("block")[1])
            base = f"features.{stage * 2}.{block}"
            if parts[1] in ("norm1", "norm2"):
                return (f"{base}.{parts[1]}." + ("weight" if parts[2] == "scale" else "bias"), ident)
            if parts[1] == "attn":
                if parts[2] == "relative_position_bias_table":
                    return (f"{base}.attn.relative_position_bias_table", ident)
                name = "weight" if parts[3] == "kernel" else "bias"
                return (f"{base}.attn.{parts[2]}.{name}",
                        inv_linear if parts[3] == "kernel" else ident)
            if parts[1] == "mlp_fc1":
                return (f"{base}.mlp.0." + ("weight" if parts[2] == "kernel" else "bias"),
                        inv_linear if parts[2] == "kernel" else ident)
            if parts[1] == "mlp_fc2":
                return (f"{base}.mlp.3." + ("weight" if parts[2] == "kernel" else "bias"),
                        inv_linear if parts[2] == "kernel" else ident)
        raise AssertionError(f"unmapped {fkey}")

    state, expected = _fake_torch_tensors(init, rules)
    got = port_swin3d(state, depths=depths)
    a = jax.tree.map(lambda x: np.asarray(x), expected)
    for path, leaf in jax.tree_util.tree_flatten_with_path(got)[0]:
        exp = a
        for p in path:
            exp = exp[p.key]
        np.testing.assert_array_equal(np.asarray(leaf), exp, err_msg=str(path))
    assert jax.tree.map(lambda x: x.shape, got) == jax.tree.map(lambda x: x.shape, init)


def test_port_resnet3d_roundtrip():
    from laryngeal_tpu.models.resnet3d import ResNet3D, ResNet3DConfig

    sizes = (1, 1, 1, 1)
    model = ResNet3D(ResNet3DConfig(stage_sizes=sizes))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))
    init = variables["params"]

    inv_conv3d = lambda v: v.transpose(4, 3, 0, 1, 2)
    inv_linear = lambda v: v.T
    ident = lambda v: v

    def rules(fkey):
        parts = fkey.split("/")
        if parts[0] == "stem_conv":
            return ("blocks.0.conv.weight", inv_conv3d)
        if parts[0] == "stem_bn":
            return ("blocks.0.norm." + ("weight" if parts[1] == "scale" else "bias"), ident)
        if parts[0] == "proj":
            return ("blocks.5.proj." + ("weight" if parts[1] == "kernel" else "bias"),
                    inv_linear if parts[1] == "kernel" else ident)
        stage = int(parts[0][5]) and int(parts[0].split("_")[0][5:])
        block = int(parts[0].split("_")[1])
        base = f"blocks.{stage}.res_blocks.{block}"
        if parts[1].startswith("conv_"):
            return (f"{base}.branch2.conv_{parts[1][-1]}.weight", inv_conv3d)
        if parts[1].startswith("bn_"):
            return (f"{base}.branch2.norm_{parts[1][-1]}." +
                    ("weight" if parts[2] == "scale" else "bias"), ident)
        if parts[1] == "shortcut_conv":
            return (f"{base}.branch1_conv.weight", inv_conv3d)
        if parts[1] == "shortcut_bn":
            return (f"{base}.branch1_norm." +
                    ("weight" if parts[2] == "scale" else "bias"), ident)
        raise AssertionError(f"unmapped {fkey}")

    state, expected = _fake_torch_tensors(init, rules)
    # batchnorm() also wants running stats.
    for k in list(state):
        if "norm" in k and k.endswith("weight"):
            base = k[: -len(".weight")]
            n = state[k].shape[0]
            state[base + ".running_mean"] = np.zeros(n, np.float32)
            state[base + ".running_var"] = np.ones(n, np.float32)

    got = port_resnet3d(state, stage_sizes=sizes)
    assert jax.tree.map(lambda x: x.shape, got["params"]) == \
        jax.tree.map(lambda x: x.shape, init)
    assert jax.tree.map(lambda x: x.shape, got["batch_stats"]) == \
        jax.tree.map(lambda x: x.shape, variables["batch_stats"])
