"""Whole-model A/B for the 3D-ResNet50 stem output-pair packing.

Measures ResNet3D fwd + train step with `stem_pair` on/off on the real TPU.
Result (v5e, B8 32f bf16): pair=True LOSES whole-model (fwd 35.9 -> 57.0
ms) despite the isolated conv winning 1.15x — the un-interleave reshape
forces a lane relayout. See BASELINE.md; default is pair=False.
"""

import dataclasses, json, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))
import jax, jax.numpy as jnp, numpy as np
from bench_mfu_ablation import chain_time_dep
from laryngeal_tpu.models.resnet3d import ResNet3D, ResNet3DConfig
from laryngeal_tpu.utils import compile_cache
compile_cache.enable()

x = jnp.zeros((8, 32, 224, 224, 3), jnp.bfloat16)
base = ResNet3DConfig(dtype=jnp.bfloat16)
variables = ResNet3D(base).init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 224, 224, 3), jnp.float32))

for pair in (False, True):
    model = ResNet3D(dataclasses.replace(base, stem_pair=pair))

    def fwd(v, xx):
        return model.apply(v, xx, train=False)

    def train_obj(v, xx):
        def loss(pp):
            out, _ = model.apply(
                {"params": pp, "batch_stats": v["batch_stats"]}, xx,
                train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.mean((out - 1.0) ** 2).astype(jnp.float32)
        l, g = jax.value_and_grad(loss)(v["params"])
        return l + sum(jnp.sum(t.astype(jnp.float32)) * 0.0
                       for t in jax.tree_util.tree_leaves(g))

    fms = 1e3 * chain_time_dep(fwd, variables, x, 12)
    tms = 1e3 * chain_time_dep(train_obj, variables, x, 12)
    print(json.dumps({"pair": pair, "fwd_ms": round(fms, 2),
                      "fwd_clips_s": round(8e3 / fms, 1),
                      "train_ms": round(tms, 2),
                      "train_clips_s": round(8e3 / tms, 1)}), flush=True)
    jax.clear_caches()
