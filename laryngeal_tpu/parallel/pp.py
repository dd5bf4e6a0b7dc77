"""Pipeline parallelism (GPipe) over transformer blocks — shard_map + ppermute.

The reference is single-GPU (SURVEY.md §2.4); dp/tp/sp already exist here.
This module adds the fourth classic axis: partition the L identical
transformer blocks into S *stages*, one stage of L/S consecutive blocks per
device, and march M microbatches through them on a GPipe schedule. Unlike
dp/tp/sp (which lean on GSPMD sharding constraints), a pipeline's
stage-crossing dataflow is explicitly scheduled, so this is written the
TPU-native manual way: ``shard_map`` over a ('data', 'stage') mesh with
``jax.lax.ppermute`` moving activations to the next stage over ICI each
tick. Autodiff reverses the schedule for free (ppermute's transpose is the
inverse permutation), so one ``jax.grad`` over the pipelined forward is a
correct pipelined backward.

Why this shape of code:
- block params are STACKED along a leading (L,) axis and sharded over
  'stage' (`stack_layer_params`); each device scans its local (L/S, ...)
  slab with ``lax.scan`` — one compiled block body reused, no per-layer
  unrolled HLO;
- the schedule loop is a Python loop of M+S-1 ticks (static — jit sees a
  fixed unrolled pipeline), each tick = apply local stage + ppermute to the
  next stage. Ramp-up/down bubbles compute on zeros and are never read;
- embeddings/head stay outside the shard_map island in plain GSPMD-land:
  the outer jit's partitioner handles their data-parallel grads, and the
  'stage' axis only ever carries block params/activations.

Fidelity note: per-microbatch block outputs are numerically IDENTICAL to
the sequential model (no recompute tricks), so pp composes with the parity
contracts. LayerNorm-only models here have no cross-microbatch coupling
(no BatchNorm in the transformer families), making GPipe exact, not
approximate.

The bubble fraction is (S-1)/(M+S-1) — callers pick M >= S. The final
stage's outputs are returned to every stage with a masked psum (simple,
replicated); a production serving path would reduce-scatter instead — at
these model sizes (<=100 MB activations/step) the simplicity wins.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import shard_map_nocheck

DATA_AXIS = "data"
STAGE_AXIS = "stage"


def make_pp_mesh(n_stage: int, n_data: int = 1, devices=None) -> Mesh:
    """('data', 'stage') mesh — 'stage' innermost so tick-to-tick ppermute
    rides adjacent-chip ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_stage * n_data
    if need > len(devices):
        raise ValueError(f"pp mesh {n_data}x{n_stage} needs {need} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_stage)
    return Mesh(grid, (DATA_AXIS, STAGE_AXIS))


def stack_layer_params(params: Dict, num_layers: int,
                       prefix: str = "layer_") -> Tuple:
    """Split a flax param dict into (stacked block params (L, ...), rest).

    The transformer families name their blocks ``layer_{i}`` with identical
    structure (models/vivit.py, models/timesformer.py), so stacking is a
    pure tree-map; `unstack_layer_params` inverts it bit-exactly (used to
    round-trip checkpoints through the pipelined layout).
    """
    layers = [params[f"{prefix}{i}"] for i in range(num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    rest = {
        k: v for k, v in params.items()
        if not (k.startswith(prefix) and k[len(prefix):].isdigit())
    }
    return stacked, rest


def unstack_layer_params(stacked, num_layers: int, prefix: str = "layer_") -> Dict:
    return {
        f"{prefix}{i}": jax.tree.map(lambda x, i=i: x[i], stacked)
        for i in range(num_layers)
    }


def stage_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (L,) axis of stacked block params sharded over 'stage'."""
    return NamedSharding(mesh, P(STAGE_AXIS))


def pipeline_apply(
    mesh: Mesh,
    block_apply: Callable,
    stacked_params,
    x: jax.Array,
    num_microbatches: int,
) -> jax.Array:
    """GPipe-apply L stacked blocks to (B, N, D) tokens over `mesh`'s stages.

    block_apply(one_layer_params, (mb, N, D)) -> (mb, N, D) applies a single
    block. Output equals the sequential composition block_{L-1} ∘ ... ∘
    block_0 exactly (per microbatch; no cross-microbatch state). Must be
    called inside jit for the shard_map island to partition.
    """
    n_stage = mesh.shape[STAGE_AXIS]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % n_stage:
        raise ValueError(f"{n_layers} layers not divisible into {n_stage} stages")
    m = num_microbatches
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible into {m} microbatches")
    xm = x.reshape(m, b // m, *x.shape[1:])

    def stage_fn(local_params, xmb):
        # local_params: (L/S, ...); xmb: (M, mb_local, N, D)
        sid = jax.lax.axis_index(STAGE_AXIS)

        def apply_stage(tokens):
            def body(carry, p):
                return block_apply(p, carry), None

            out, _ = jax.lax.scan(body, tokens, local_params)
            return out

        fwd = [(i, i + 1) for i in range(n_stage - 1)]
        buf = jnp.zeros_like(xmb[0])
        outs = jnp.zeros_like(xmb)
        for t in range(m + n_stage - 1):
            # Stage s computes microbatch (t - s) this tick; stage 0 feeds
            # fresh input, others consume the ppermute'd previous output.
            feed = xmb[t] if t < m else jnp.zeros_like(xmb[0])
            inp = jnp.where(sid == 0, feed, buf)
            y = apply_stage(inp)
            if t >= n_stage - 1:
                done = t - (n_stage - 1)
                outs = outs.at[done].set(
                    jnp.where(sid == n_stage - 1, y, outs[done]))
            if n_stage > 1:
                buf = jax.lax.ppermute(y, STAGE_AXIS, fwd)
        # Hand the last stage's outputs to every stage (masked psum).
        outs = jax.lax.psum(
            jnp.where(sid == n_stage - 1, outs, jnp.zeros_like(outs)),
            STAGE_AXIS)
        return outs

    out = shard_map_nocheck(
        stage_fn,
        mesh,
        in_specs=(P(STAGE_AXIS), P(None, DATA_AXIS)),
        out_specs=P(None, DATA_AXIS),
    )(stacked_params, xm)
    return out.reshape(b, *x.shape[1:])


def timesformer_pipeline_forward(
    cfg,
    stacked_params,
    rest_params: Dict,
    pixel_values: jax.Array,
    mesh: Mesh,
    num_microbatches: int,
) -> jax.Array:
    """Full TimeSformer forward with the block stack pipelined over stages.

    Same contract as :func:`vivit_pipeline_forward`: numerically identical
    to ``TimesformerForVideoClassification.apply`` on the unstacked params
    (tests/test_pp.py). The divided space-time reshapes live entirely
    inside each block, so a block is still a (mb, 1+n*t, D) -> same-shape
    map and pipelines unchanged.
    """
    import flax.linen as nn

    from ..models.timesformer import TimesformerEmbeddings, TimesformerLayer

    x = TimesformerEmbeddings(cfg).apply(
        {"params": rest_params["embeddings"]}, pixel_values)
    layer = TimesformerLayer(cfg)

    def block_apply(p, tokens):
        return layer.apply({"params": p}, tokens)

    x = pipeline_apply(mesh, block_apply, stacked_params, x, num_microbatches)
    x = nn.LayerNorm(epsilon=cfg.layer_norm_eps).apply(
        {"params": rest_params["layernorm"]}, x)
    logits = nn.Dense(cfg.num_classes).apply(
        {"params": rest_params["classifier"]}, x[:, 0])
    return logits.astype(jnp.float32)


def vivit_pipeline_forward(
    cfg,
    stacked_params,
    rest_params: Dict,
    pixel_values: jax.Array,
    mesh: Mesh,
    num_microbatches: int,
) -> jax.Array:
    """Full ViViT forward with the 12-block stack pipelined over stages.

    Numerically identical to ``VivitForVideoClassification.apply`` on the
    unstacked params (tests/test_pp.py pins it): embeddings and head run in
    plain GSPMD-land (replicated params, data-sharded batch); only the block
    stack crosses the shard_map pipeline island. ``stacked_params`` /
    ``rest_params`` come from :func:`stack_layer_params`; keep the stacked
    tree device_put with :func:`stage_sharding` so each device stores only
    its own stage's blocks.
    """
    import flax.linen as nn

    from ..models.layers import TransformerBlock, gelu_fast
    from ..models.vivit import VivitEmbeddings

    x = VivitEmbeddings(cfg).apply(
        {"params": rest_params["embeddings"]}, pixel_values)
    block = TransformerBlock(
        cfg.hidden_size, cfg.num_heads, cfg.intermediate_size, act=gelu_fast,
        layer_norm_eps=cfg.layer_norm_eps, dtype=cfg.dtype)

    def block_apply(p, tokens):
        return block.apply({"params": p}, tokens)

    x = pipeline_apply(mesh, block_apply, stacked_params, x, num_microbatches)
    x = nn.LayerNorm(epsilon=cfg.layer_norm_eps).apply(
        {"params": rest_params["layernorm"]}, x)
    logits = nn.Dense(cfg.num_classes).apply(
        {"params": rest_params["classifier"]}, x[:, 0])
    return logits.astype(jnp.float32)


class PipelinedModel:
    """Duck-typed Flax-model adapter making GPipe reachable through the
    standard Trainer/steps machinery (train/steps.py only ever calls
    ``model.init`` / ``model.apply``).

    ``init`` initializes the wrapped sequential model and re-lays its params
    out as ``{"stacked": (L, ...) block stack, "rest": embeddings/head}``;
    ``apply`` runs the family's pipelined forward over ``mesh``. Keep the
    TrainState produced from this adapter sharded with :func:`shard_pp_state`
    so each device stores only its own stage's blocks (and their optimizer
    moments). ``to_sequential_params`` / ``from_sequential_params`` convert
    checkpoints between the two layouts.

    The reference is single-GPU (SURVEY.md §2.4) — no counterpart; this is
    the TPU-native scale-out path for the transformer families.
    """

    is_pipelined = True

    def __init__(self, model, mesh: Mesh, num_microbatches: int):
        fam = type(model).__name__
        if "Vivit" in fam:
            self._forward = vivit_pipeline_forward
        elif "Timesformer" in fam:
            self._forward = timesformer_pipeline_forward
        else:
            raise ValueError(
                f"pipeline parallelism supports the uniform-stack transformer "
                f"families (vivit/timesformer), got {fam}. swin3d/CNNs are "
                f"excluded by design: their heterogeneous stages (swin3d "
                f"depths (2,2,6,2), widths 96-768) are ~3x compute-unbalanced "
                f"at the PatchMerging cut points, so the slowest stage makes "
                f"GPipe's best case lose to plain dp; use --fsdp for memory "
                f"and dp for throughput (full rationale: PARITY.md pp row)")
        n_stage = mesh.shape[STAGE_AXIS]
        if model.config.num_layers % n_stage:
            raise ValueError(
                f"{model.config.num_layers} layers not divisible into "
                f"{n_stage} stages")
        if num_microbatches < n_stage:
            raise ValueError(
                f"num_microbatches {num_microbatches} < stages {n_stage}: "
                f"the bubble would dominate (pick M >= S)")
        self.inner = model
        self.config = model.config
        self.mesh = mesh
        self.num_microbatches = num_microbatches

    def init(self, rng, sample_input):
        variables = self.inner.init(rng, sample_input)
        stacked, rest = stack_layer_params(
            variables["params"], self.config.num_layers)
        return {"params": {"stacked": stacked, "rest": rest}}

    def apply(self, variables, pixel_values, train: bool = False,
              rngs=None, mutable=None):
        # train/rngs accepted for steps.py signature-compat; the pipelined
        # families are dropout-free so the forward is deterministic.
        p = variables["params"]
        return self._forward(self.config, p["stacked"], p["rest"],
                             pixel_values, self.mesh, self.num_microbatches)


def shard_pp_state(state, mesh: Mesh):
    """device_put a TrainState from :class:`PipelinedModel`: every leaf under
    a ``stacked`` key (params AND the optimizer moments mirroring them) gets
    the leading-(L,) stage sharding; everything else replicates."""
    stage = stage_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def put(path, x):
        names = {getattr(k, "key", getattr(k, "name", None)) for k in path}
        return jax.device_put(x, stage if "stacked" in names else rep)

    return jax.tree_util.tree_map_with_path(put, state)


def shard_pp_state_fsdp(state, mesh: Mesh, min_elems: int = None):
    """PP x FSDP composition: stacked block leaves keep the leading-(L,)
    'stage' shard AND gain a 'data' shard on their largest remaining
    dimension (ZeRO-3 within each stage group); non-stacked leaves get the
    plain FSDP layout over 'data'. Optimizer moments mirror their params
    by the same purely shape+path-driven rule."""
    from .fsdp import MIN_SHARD_ELEMS, _compose_fsdp_spec, fsdp_leaf_sharding

    if min_elems is None:
        min_elems = MIN_SHARD_ELEMS
    n_data = mesh.shape[DATA_AXIS]
    rep = NamedSharding(mesh, P())

    def put(path, x):
        names = {getattr(k, "key", getattr(k, "name", None)) for k in path}
        shape = getattr(x, "shape", ())
        if "stacked" in names:
            # P('stage') on dim 0, then ZeRO-3 'data' on the largest free dim.
            spec = _compose_fsdp_spec(P(STAGE_AXIS), shape, n_data,
                                      min_elems, DATA_AXIS)
            return jax.device_put(x, NamedSharding(mesh, spec))
        if not shape:
            return jax.device_put(x, rep)
        return jax.device_put(
            x, fsdp_leaf_sharding(mesh, shape, DATA_AXIS, min_elems))

    return jax.tree_util.tree_map_with_path(put, state)


def to_sequential_params(pp_params: Dict, num_layers: int) -> Dict:
    """{"stacked","rest"} pipeline layout -> the sequential model's params."""
    out = dict(pp_params["rest"])
    out.update(unstack_layer_params(pp_params["stacked"], num_layers))
    return out


def from_sequential_params(params: Dict, num_layers: int) -> Dict:
    """Sequential params -> {"stacked","rest"} (inverse of the above)."""
    stacked, rest = stack_layer_params(params, num_layers)
    return {"stacked": stacked, "rest": rest}
