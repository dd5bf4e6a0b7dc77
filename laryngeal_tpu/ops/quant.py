"""W8A8 dynamic-quantized inference (int8 on the MXU).

The v5e MXU nominally runs int8 x int8 -> int32 at 2x the bf16 rate
(394 vs 197 TOPS). Measured reality on this chip (BASELINE.md): the ViViT-B
forward is attention-bound and XLA's int8 dot barely beats bf16 at these
dense shapes, so W8A8 is SPEED-NEUTRAL here — its value is ~4x smaller
export artifacts at 8e-4 probability drift, with upside on hardware where
the int8 rate is realized. Quantization is an INFERENCE/EXPORT-time
transformation — the training path never sees it:

- ``quantize_params``: walks a Flax param tree and replaces every eligible
  Dense kernel (2-D, both dims >= 128, not on the exclusion list) with a
  per-output-channel symmetric int8 ``kernel_q8`` + f32 ``kernel_scale``.
  LayerNorm/bias vectors, classifier heads and LSTM gates stay f32.
- ``quantize_conv_kernels`` / ``dequantize_conv_kernels``: WEIGHT-ONLY int8
  for conv kernels (>2-D) — stored int8, dequantized in-graph at apply so
  compute stays f32/bf16 and exported artifacts keep int8 constants. This
  is the artifact-size win for the conv families (resnet3d, the frozen
  lstm trunk, patch embeds).
- ``quant_interceptor``: an ``nn.intercept_methods`` interceptor that
  reroutes exactly those Dense modules (matched by module path) through the
  quantized matmul: dynamic per-token activation scales (abs-max / 127),
  int8 x int8 -> int32 ``dot_general``, rescale by ``a_scale * w_scale``,
  f32 bias add. Everything else (attention, convs, norms) runs unchanged.
- ``quantized_apply``: convenience wrapper tying both together.

Accuracy: per-channel weights + per-token dynamic activations is the
standard W8A8 recipe for ViTs (see PAPERS.md, "Model Quantization and
Hardware Acceleration for Vision Transformers"); tests pin probability
drift on real (tiny) models.

No reference counterpart — the reference serves f32 torch checkpoints
(``vivit_transformer/inference.py:31-88``).
"""

from __future__ import annotations

from typing import Callable, FrozenSet, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Substrings of param paths that must never be quantized: small classifier
# heads (accuracy-critical, negligible FLOPs) and recurrent gates (error
# feedback through the time scan compounds).
DEFAULT_EXCLUDE = ("classifier", "head", "lstm", "rnn")

_MIN_DIM = 128  # both kernel dims must reach the MXU tile for int8 to pay


def _eligible(path: Tuple[str, ...], value, exclude) -> bool:
    if path[-1] != "kernel" or value.ndim != 2:
        return False
    if min(value.shape) < _MIN_DIM:
        return False
    # Match exclusion tokens against whole path components, not substrings —
    # a future "multi_head_attention" module must not silently stay f32
    # because it contains "head".
    comps = [p.lower() for p in path]
    return not any(tok == c or c.startswith(tok + "_") or c.endswith("_" + tok)
                   for tok in exclude for c in comps)


def quantize_kernel(kernel) -> Tuple[jax.Array, jax.Array]:
    """f32 (in, out) -> int8 kernel + f32 per-output-channel scale."""
    kernel = jnp.asarray(kernel, jnp.float32)
    scale = jnp.max(jnp.abs(kernel), axis=0) / 127.0          # (out,)
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(kernel / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_params(params, exclude: Sequence[str] = DEFAULT_EXCLUDE,
                    logger=None):
    """Return (quantized param tree, frozenset of quantized module paths).

    The returned paths name the parent Dense module (tuple of tree keys up
    to but excluding ``kernel``) — the interceptor matches on them. Pass a
    ``logger`` to see exactly which modules were quantized vs excluded
    (silent misses are otherwise invisible).
    """
    try:  # legacy FrozenDict trees would otherwise walk as opaque leaves
        from flax.core import unfreeze

        params = unfreeze(params)
    except Exception:
        pass
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    quantized_paths = set()
    skipped = []
    for keypath, value in flat:
        path = tuple(getattr(k, "key", str(k)) for k in keypath)
        if _eligible(path, value, exclude):
            quantized_paths.add(path[:-1])
        elif path[-1] == "kernel" and value.ndim == 2 \
                and min(value.shape) >= _MIN_DIM:
            skipped.append("/".join(path[:-1]))  # excluded, not too-small
    if logger:
        logger.info("int8 quantization: %d Dense modules quantized, "
                    "%d excluded by token (%s)", len(quantized_paths),
                    len(skipped), ", ".join(sorted(skipped)) or "-")

    def walk(tree, prefix):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            p = prefix + (name,)
            if isinstance(sub, dict):
                out[name] = walk(sub, p)
            elif prefix in quantized_paths and name == "kernel":
                q, s = quantize_kernel(sub)
                out["kernel_q8"] = q
                out["kernel_scale"] = s
            else:
                out[name] = sub
        return out

    return walk(dict(params), ()), frozenset(quantized_paths)


_CONV_MIN_ELEMS = 4096  # skip tiny convs: no size win, pure risk


def quantize_conv_kernels(params, exclude: Sequence[str] = DEFAULT_EXCLUDE,
                          min_elems: int = _CONV_MIN_ELEMS, logger=None):
    """WEIGHT-ONLY int8 for conv kernels (ndim >= 3).

    The conv families (resnet3d, the lstm trunk, swin/vivit patch embeds)
    got no artifact-size win from Dense-only W8A8 (round-2 VERDICT weak #7).
    Here each eligible conv ``kernel`` becomes per-output-channel symmetric
    int8 ``kernel_q8`` + f32 ``kernel_scale``; the kernel is DEQUANTIZED
    in-graph at apply time (``dequantize_conv_kernels``), so compute runs
    the normal f32/bf16 convolution — the int8 lives only in the stored
    artifact (XLA constant-folds the dequantize on load). Returns
    ``(tree, frozenset of conv module paths)``.
    """
    try:
        from flax.core import unfreeze

        params = unfreeze(params)
    except Exception:
        pass
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    conv_paths = set()
    for keypath, value in flat:
        path = tuple(getattr(k, "key", str(k)) for k in keypath)
        if path[-1] != "kernel" or value.ndim < 3:
            continue
        if value.size < min_elems:
            continue
        comps = [p.lower() for p in path]
        if any(tok == c or c.startswith(tok + "_") or c.endswith("_" + tok)
               for tok in exclude for c in comps):
            continue
        conv_paths.add(path[:-1])

    def walk(tree, prefix):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            p = prefix + (name,)
            if isinstance(sub, dict):
                out[name] = walk(sub, p)
            elif prefix in conv_paths and name == "kernel":
                k = jnp.asarray(sub, jnp.float32)
                axes = tuple(range(k.ndim - 1))           # per out channel
                scale = jnp.maximum(jnp.max(jnp.abs(k), axis=axes) / 127.0,
                                    1e-12)
                out["kernel_q8"] = jnp.clip(
                    jnp.round(k / scale), -127, 127).astype(jnp.int8)
                out["kernel_scale"] = scale
            else:
                out[name] = sub
        return out

    if logger:
        logger.info("int8 conv-weight quantization: %d conv kernels",
                    len(conv_paths))
    return walk(dict(params), ()), frozenset(conv_paths)


def dequantize_conv_kernels(params):
    """Restore f32 ``kernel`` leaves from conv ``kernel_q8``/``kernel_scale``
    pairs (ndim >= 3); Dense q8 pairs (ndim == 2) are left for the runtime
    W8A8 interceptor. Traced in-graph: exported artifacts keep int8
    constants, XLA folds the dequantize at load-compile time."""

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            if isinstance(sub, dict):
                out[name] = walk(sub)
            else:
                out[name] = sub
        q = out.get("kernel_q8")
        if q is not None and getattr(q, "ndim", 0) >= 3:
            out["kernel"] = (q.astype(jnp.float32)
                             * out["kernel_scale"]).astype(jnp.float32)
            del out["kernel_q8"], out["kernel_scale"]
        return out

    return walk(params)


def quant_dense_forward(module: "nn.Dense", x: jax.Array) -> jax.Array:
    """The W8A8 Dense body, reading ``kernel_q8``/``kernel_scale`` params."""
    in_features = x.shape[-1]
    k_q = module.param("kernel_q8", nn.initializers.zeros,
                       (in_features, module.features), jnp.int8)
    k_s = module.param("kernel_scale", nn.initializers.ones,
                       (module.features,), jnp.float32)
    xf = x.astype(jnp.float32)
    a_s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # per token
    a_s = jnp.maximum(a_s, 1e-12)
    x_q = jnp.clip(jnp.round(xf / a_s), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, k_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * a_s * k_s
    if module.use_bias:
        bias = module.param("bias", nn.initializers.zeros,
                            (module.features,), jnp.float32)
        y = y + bias
    return y.astype(module.dtype or x.dtype)


def make_quant_interceptor(quantized_paths: FrozenSet[Tuple[str, ...]]):
    """Interceptor rerouting the listed Dense modules through W8A8."""

    def interceptor(next_fun: Callable, args, kwargs, context):
        mod = context.module
        if (type(mod) is nn.Dense and context.method_name == "__call__"
                and tuple(mod.path) in quantized_paths):
            return quant_dense_forward(mod, args[0])
        return next_fun(*args, **kwargs)

    return interceptor


def quantized_apply(model: nn.Module, variables, *args,
                    quantized_paths: Optional[FrozenSet] = None, **kwargs):
    """``model.apply`` with the listed Dense modules running W8A8 and conv
    ``kernel_q8`` weights dequantized in-graph.

    ``variables['params']`` must already be the quantized tree; if
    ``quantized_paths`` is omitted it is derived from the tree (Dense
    modules holding a 2-D ``kernel_q8``).
    """
    params = dequantize_conv_kernels(variables["params"])
    variables = dict(variables, params=params)
    if quantized_paths is None:
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        quantized_paths = frozenset(
            tuple(getattr(k, "key", str(k)) for k in kp)[:-1]
            for kp, _ in flat
            if getattr(kp[-1], "key", None) == "kernel_q8")
    with nn.intercept_methods(make_quant_interceptor(quantized_paths)):
        return model.apply(variables, *args, **kwargs)
