"""TimeSformer / ResNet3D forward-MFU ablations (round-2 VERDICT weak #2 tail).

BASELINE.md's five-backbone table records TimeSformer-B at 24% MFU and
3D-ResNet50 at 27% with no attribution. Same method as the committed ViViT
ablation: time the full forward and component-skipped variants with the
chained-jit harness (fori_loop carry dependence, CLAUDE.md microbench rule);
the per-component cost is the ablated-identity diff. FLOPs per component come
from XLA ``cost_analysis()`` diffs so each component gets its own achieved
TF/s — separating "the dense path is slow" from "the cheap glue is expensive".

Variant modules subclass the real models with skip flags; submodule names are
identical, so the *same* trained/random param tree binds (flax ignores unused
params at apply time) — no weight surgery, no drift between what is measured
and what ships.

Usage (TPU): python scripts/bench_mfu_ablation.py [--family timesformer,resnet3d]
             [--iters 12] [--batch 8] [--frames 32]
Results recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # nominal v5e bf16 (BASELINE.md quotes MFU against this)


# ------------------------------------------------------------- timesformer
def make_timesformer_variant(skip):
    """TimesformerForVideoClassification with named sub-blocks skipped.

    skip ⊆ {"temporal", "spatial", "mlp"}; submodule names match the real
    model (models/timesformer.py) so its param tree binds unchanged.
    """
    from laryngeal_tpu.models.layers import gelu_exact
    from laryngeal_tpu.models.timesformer import (
        FusedQKVAttention, TimesformerConfig, TimesformerEmbeddings)

    class Layer(nn.Module):
        config: TimesformerConfig

        @nn.compact
        def __call__(self, x):
            cfg = self.config
            b, total, d = x.shape
            t = cfg.num_frames
            n = (total - 1) // t
            cls, patches = x[:, :1], x[:, 1:]

            if "temporal" not in skip:
                pt = patches.reshape(b * n, t, d)
                h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                 name="temporal_layernorm")(pt)
                h = FusedQKVAttention(cfg.hidden_size, cfg.num_heads,
                                      dtype=cfg.dtype,
                                      name="temporal_attention")(h)
                h = h.reshape(b, n * t, d)
                h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                             name="temporal_dense")(h)
                patches = patches + h

            if "spatial" not in skip:
                sp = (patches.reshape(b, n, t, d).transpose(0, 2, 1, 3)
                      .reshape(b * t, n, d))
                cls_tiled = jnp.repeat(cls, t, axis=0)
                sp = jnp.concatenate([cls_tiled, sp], axis=1)
                h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                 name="layernorm_before")(sp)
                h = FusedQKVAttention(cfg.hidden_size, cfg.num_heads,
                                      dtype=cfg.dtype, name="attention")(h)
                cls_res = h[:, 0].reshape(b, t, d).mean(axis=1, keepdims=True)
                patch_res = (h[:, 1:].reshape(b, t, n, d).transpose(0, 2, 1, 3)
                             .reshape(b, n * t, d))
                x = jnp.concatenate([cls, patches], axis=1) + jnp.concatenate(
                    [cls_res, patch_res], axis=1)
            else:
                x = jnp.concatenate([cls, patches], axis=1)

            if "mlp" not in skip:
                h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                 name="layernorm_after")(x)
                h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                             name="mlp_fc1")(h)
                h = gelu_exact(h)
                h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                             name="mlp_fc2")(h)
                x = x + h
            return x

    class Model(nn.Module):
        config: TimesformerConfig

        @nn.compact
        def __call__(self, pixel_values):
            cfg = self.config
            x = TimesformerEmbeddings(cfg, name="embeddings")(pixel_values)
            for i in range(cfg.num_layers):
                x = Layer(cfg, name=f"layer_{i}")(x)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(x)
            return nn.Dense(cfg.num_classes,
                            name="classifier")(x[:, 0]).astype(jnp.float32)

    return Model


def timesformer_cases(batch, frames):
    from laryngeal_tpu.models.timesformer import (
        TimesformerConfig, TimesformerForVideoClassification)

    cfg = TimesformerConfig(num_frames=frames, num_classes=2,
                            dtype=jnp.bfloat16)
    full = TimesformerForVideoClassification(cfg)
    x = jnp.zeros((batch, frames, 224, 224, 3), jnp.bfloat16)
    params = full.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, frames, 224, 224, 3), jnp.float32))["params"]

    def apply_fn(module):
        def fn(p, xx):
            return module.apply({"params": p}, xx)
        return fn

    cases = {"full": apply_fn(full)}
    for name in ("temporal", "spatial", "mlp"):
        cases[f"no_{name}"] = apply_fn(make_timesformer_variant({name})(cfg))
    return cases, params, x


# --------------------------------------------------------------- resnet3d
def make_resnet3d_prefix(upto):
    """ResNet3D truncated after `upto` stages (0 = stem only); same names."""
    from laryngeal_tpu.models.resnet3d import Bottleneck3D, ResNet3DConfig, _bn

    class Model(nn.Module):
        config: ResNet3DConfig

        @nn.compact
        def __call__(self, x):
            cfg = self.config
            x = nn.Conv(64, (3, 7, 7), strides=(1, 2, 2),
                        padding=[(1, 1), (3, 3), (3, 3)], use_bias=False,
                        dtype=cfg.dtype, name="stem_conv")(x)
            x = nn.relu(_bn(False, cfg.dtype, "stem_bn")(x))
            x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                            padding=[(0, 0), (1, 1), (1, 1)])
            widths = (64, 128, 256, 512)
            for stage, (blocks, w) in enumerate(
                    zip(cfg.stage_sizes, widths)):
                if stage >= upto:
                    break
                for i in range(blocks):
                    stride = cfg.stage_spatial_stride[stage] if i == 0 else 1
                    x = Bottleneck3D(
                        w, temporal_kernel_a=cfg.stage_temporal_kernel_a[stage],
                        spatial_stride=stride, downsample=(i == 0),
                        dtype=cfg.dtype, name=f"stage{stage + 1}_{i}",
                    )(x, train=False)
            # Scalar-ish reduce so every prefix has a cheap comparable output.
            return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))

    return Model


def resnet3d_cases(batch, frames):
    from laryngeal_tpu.models.resnet3d import ResNet3D, ResNet3DConfig

    cfg = ResNet3DConfig(dtype=jnp.bfloat16)
    full = ResNet3D(cfg)
    x = jnp.zeros((batch, frames, 224, 224, 3), jnp.bfloat16)
    variables = full.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, frames, 224, 224, 3), jnp.float32))

    def fn_full(v, xx):
        return full.apply(v, xx, train=False)

    cases = {"full": fn_full}
    for upto, label in ((0, "stem"), (1, "thru_stage1"), (2, "thru_stage2"),
                        (3, "thru_stage3"), (4, "thru_stage4")):
        m = make_resnet3d_prefix(upto)(cfg)

        def fn(v, xx, _m=m):
            return _m.apply(v, xx)

        cases[label] = fn
    return cases, dict(variables), x


# ---------------------------------------------------------------- harness
def chain_time_dep(fn, params, x, iters):
    """Carry->input dependence so XLA cannot hoist fn out of the loop
    (the round-2 hoisting trap; BASELINE.md 'CORRECTED' note)."""

    @jax.jit
    def chain(p, xx):
        def body(i, carry):
            acc, cur = carry
            out = fn(p, cur)
            bump = jnp.sum(out.astype(jnp.float32)) * 1e-12
            return acc + bump, xx + bump.astype(xx.dtype)
        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), xx))
        return acc

    np.asarray(chain(params, x))
    t0 = time.perf_counter()
    np.asarray(chain(params, x))
    return (time.perf_counter() - t0) / iters


def flops_of(fn, params, x):
    try:
        c = jax.jit(fn).lower(params, x).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", float("nan")))
    except Exception:
        return float("nan")


def run_family(name, cases, params, x, iters, batch):
    rows = {}
    flops = {k: flops_of(fn, params, x) for k, fn in cases.items()}
    for k, fn in cases.items():
        ms = 1e3 * chain_time_dep(fn, params, x, iters)
        rows[k] = {"ms": round(ms, 2), "gflop": round(flops[k] / 1e9, 1)}
    full = rows["full"]

    comp = {}
    for k, r in rows.items():
        if k == "full":
            continue
        if k.startswith("no_"):
            dms = full["ms"] - r["ms"]
            dgf = full["gflop"] - r["gflop"]
            comp[k[3:]] = dms, dgf
    # Prefix decomposition (resnet3d): successive diffs.
    prefix_order = [k for k in ("stem", "thru_stage1", "thru_stage2",
                                "thru_stage3", "thru_stage4") if k in rows]
    prev = {"ms": 0.0, "gflop": 0.0}
    for k in prefix_order:
        comp[k] = (rows[k]["ms"] - prev["ms"],
                   rows[k]["gflop"] - prev["gflop"])
        prev = rows[k]

    for k, (dms, dgf) in comp.items():
        rows[f"component_{k}"] = {
            "ms": round(dms, 2), "gflop": round(dgf, 1),
            "tf_per_sec": round(dgf / max(dms, 1e-9), 1),
            "pct_of_peak": round(100 * dgf / max(dms, 1e-9) / PEAK_TFLOPS, 1),
        }
    rows["full"]["clips_per_sec"] = round(batch / (full["ms"] / 1e3), 1)
    rows["full"]["mfu_pct"] = round(
        100 * full["gflop"] / full["ms"] / PEAK_TFLOPS, 1)
    print(json.dumps({name: rows}), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="timesformer,resnet3d")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args()

    from laryngeal_tpu.utils.compile_cache import enable
    enable("/tmp/laryngeal_cc")

    out = {}
    for fam in args.family.split(","):
        fam = fam.strip()
        cases, params, x = (timesformer_cases if fam == "timesformer"
                            else resnet3d_cases)(args.batch, args.frames)
        out[fam] = run_family(fam, cases, params, x, args.iters, args.batch)
        jax.clear_caches()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
