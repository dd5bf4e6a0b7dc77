"""Sequence (context) parallelism — token-axis activation sharding.

The reference has no distributed support at all (SURVEY.md §2.4); dp and tp
already exist here (parallel/mesh.py, parallel/tp.py). This module adds the
third axis for the transformer families: shard the *token* dimension of the
(B, N, D) activations across the mesh's 'seq' axis, so per-device activation
memory and per-device attention/MLP work scale down with the axis size — the
multi-chip lever for longer clips (TimeSformer at 32 frames carries 6273
tokens and already needs remat to train at B8 on one chip; with sp=k each
device holds N/k of every activation).

Design — GSPMD, not hand-written collectives (the TPU-native recipe):
the models call :func:`constrain_tokens` on their carried (B, N, D)
activations once per transformer block; everything between two constraints
is layout-inferred by XLA's SPMD partitioner:

- LayerNorm / Dense / MLP are elementwise along N -> they stay token-sharded
  with ZERO collectives (the Megatron "sequence parallel region" for free);
- attention needs every key/value for each query -> the partitioner keeps q
  token-sharded and all-gathers k/v over 'seq' (the standard all-gather-KV
  context parallelism; at these lengths — ViViT N=3137, TimeSformer 6273 —
  ring attention would add latency for no memory win);
- TimeSformer's per-layer (B, n*t, D) <-> (B*n, t, D) <-> (B*t, 1+n, D)
  reshapes re-shard automatically (an all-to-all where the split moves
  between batch-like and token axes).

Attention impl note: the Pallas kernels are opaque custom calls the SPMD
partitioner cannot split, so while sequence sharding is enabled
``ops.attention`` routes to the XLA path (partitionable q-sharded); see
``dot_product_attention``. Single-chip runs keep the kernels.

Composition: 'seq' is orthogonal to 'data' (batch) and 'model' (Megatron
head/ffn sharding) — a dp x sp x tp mesh shards batch, tokens, and heads
simultaneously (exercised in __graft_entry__.dryrun_multichip and
tests/test_sp_equivalence.py).

Uneven token counts (ViViT's 3137 = 3136 patches + cls is prime) are fine:
``with_sharding_constraint`` tolerates non-divisible dimensions — GSPMD
pads the last shard internally with exact semantics.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, SEQ_AXIS

# Trace-time state: models consult this inside their traced forward, so it
# must be set around jit tracing (enable_sequence_sharding before building
# the step, or the `sequence_sharding` context manager around the first
# call). Plain module global, same pattern as ops.attention._IMPL.
_STATE: Optional[tuple] = None  # (mesh, data_axis, seq_axis)


def enable_sequence_sharding(mesh: Mesh, data_axis: str = DATA_AXIS,
                             seq_axis: str = SEQ_AXIS) -> None:
    """Token-shard (B, N, D) transformer activations over `mesh`'s seq axis."""
    if seq_axis not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{seq_axis}' axis")
    global _STATE
    _STATE = (mesh, data_axis, seq_axis)


def disable_sequence_sharding() -> None:
    global _STATE
    _STATE = None


def sequence_sharding_enabled() -> bool:
    return _STATE is not None


def seq_axis_size() -> int:
    """Mesh extent of the sequence axis (1 when sp is disabled)."""
    if _STATE is None:
        return 1
    mesh, _, seq_axis = _STATE
    return mesh.shape[seq_axis]


@contextmanager
def sequence_sharding(mesh: Mesh):
    """Scope sequence sharding around step construction / first trace."""
    enable_sequence_sharding(mesh)
    try:
        yield
    finally:
        disable_sequence_sharding()


def constrain_tokens(x: jax.Array) -> jax.Array:
    """Pin a (B, N, D) activation to (data, seq, None) sharding.

    No-op when sequence sharding is disabled or the array is not rank-3, so
    models call it unconditionally at block boundaries. Explicit JAX
    shardings require exact divisibility, so each axis appears in the spec
    only when its dimension divides the mesh extent — model.init's batch-1
    trace skips 'data', and a non-multiple token count skips 'seq' (the
    models pad tokens first; see pad_tokens/padded_key_bias).
    """
    if _STATE is None or x.ndim != 3:
        return x
    mesh, data_axis, seq_axis = _STATE
    spec = P(
        data_axis if x.shape[0] % mesh.shape[data_axis] == 0 else None,
        seq_axis if x.shape[1] % mesh.shape[seq_axis] == 0 else None,
        None,
    )
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def anchor_tokens_replicated(x: jax.Array) -> jax.Array:
    """Pin (B, N, D) to (data, None, None) — token axis replicated.

    Used at the patch-embedding output, BEFORE the first token-sharded
    constraint: with a token-sharded output cotangent, XLA's SPMD
    partitioner miscompiles the stride==kernel tubelet conv's kernel
    gradient (observed on the CPU backend: projection/bias grad — the sum
    of the same cotangent — exact, projection/kernel grad wholesale wrong;
    tests/test_sp_equivalence.py would catch a regression). The anchor
    keeps the conv and its grads in plain batch-parallel land at the cost
    of one (B, N, D) cotangent all-gather per step — negligible against
    the 12-layer stack it unblocks. No-op when sp is disabled.
    """
    if _STATE is None or x.ndim != 3:
        return x
    mesh, data_axis, _ = _STATE
    spec = P(
        data_axis if x.shape[0] % mesh.shape[data_axis] == 0 else None,
        None, None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def pad_tokens(x: jax.Array) -> jax.Array:
    """Zero-pad the token axis of (B, N, D) up to a seq-axis multiple.

    Explicit shardings need N % n_seq == 0, and ViViT's real token count
    (3137 = 3136 patches + cls) is prime — so under sp the model pads once
    after the embeddings and masks the padded keys out of every attention
    with :func:`padded_key_bias`. Padded positions only ever feed
    elementwise ops (LN/MLP) and masked-out attention keys, so real-token
    values and gradients are exact; the classifier reads token 0. No-op
    when sp is off or N already divides.
    """
    s = seq_axis_size()
    n = x.shape[1]
    if s == 1 or n % s == 0:
        return x
    n_pad = -(-n // s) * s
    return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))


class TrailingKeyMask:
    """Static marker for "keys >= n_real are padding" attention masks.

    Carries the valid count as a Python int so implementations can apply it
    without a bias tensor: the flash kernel masks trailing keys in-register
    (``flash_attention(kv_valid=...)``, free — it already masks its own
    block padding), while the XLA path materializes the additive form via
    :meth:`materialize`. ``dot_product_attention`` accepts this anywhere a
    bias array is accepted.
    """

    def __init__(self, n_total: int, n_real: int):
        self.n_total = int(n_total)
        self.n_real = int(n_real)

    def materialize(self) -> jax.Array:
        """(1, 1, 1, n_total) additive bias: 0 real keys, -1e9 padding
        (softmax weight underflows to exactly 0.0 in f32/bf16)."""
        mask = jnp.arange(self.n_total) < self.n_real
        return jnp.where(mask, 0.0, -1e9).astype(jnp.float32)[
            None, None, None, :]


# Leafless pytree (all state is static aux data): the mask rides through
# jit / nn.remat / scan argument flattening as pure structure, never as a
# traced array — which is the whole point of carrying the count statically.
jax.tree_util.register_pytree_node(
    TrailingKeyMask,
    lambda m: ((), (m.n_total, m.n_real)),
    lambda aux, _: TrailingKeyMask(*aux),
)


def padded_key_bias(n_total: int, n_real: int) -> Optional[TrailingKeyMask]:
    """Trailing-key padding mask for attention, or None when nothing is
    padded — callers pass it straight to ``dot_product_attention(bias=...)``.
    """
    if n_total == n_real:
        return None
    return TrailingKeyMask(n_total, n_real)


def sp_sharded_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         kv_valid: Optional[int] = None) -> Optional[jax.Array]:
    """Flash attention under sequence sharding: shard_map over the mesh with
    q kept token-sharded and k/v all-gathered over the 'seq' axis, calling
    the Pallas kernel per shard (the all-gather-KV context parallelism the
    GSPMD partitioner performs for the XLA path — but GSPMD cannot split an
    opaque Pallas custom call, so this routes it by hand; the kernel now
    takes Nq != Nk for exactly this). Autodiff reverses the all-gather into
    a reduce-scatter for dk/dv.

    Returns None when the shapes don't shard cleanly (caller falls back to
    the partitionable XLA path): batch must divide the data axis, tokens the
    seq axis, and heads the model axis when tensor parallelism is active.
    """
    if _STATE is None:
        return None
    mesh, data_axis, seq_axis = _STATE
    s = mesh.shape[seq_axis]
    b, n_q, h, d = q.shape
    if s == 1 or n_q % s or k.shape[1] % s or b % mesh.shape[data_axis]:
        return None
    from .mesh import MODEL_AXIS

    m = mesh.shape.get(MODEL_AXIS, 1) if MODEL_AXIS in mesh.axis_names else 1
    head_axis = None
    if m > 1:
        if h % m:
            return None
        head_axis = MODEL_AXIS
    from jax.sharding import PartitionSpec as P

    from ..ops.flash_attention import flash_attention
    from .mesh import shard_map_nocheck

    spec = P(data_axis, seq_axis, head_axis, None)
    n_k = k.shape[1]
    n_pad = -(-n_k // 128) * 128
    block_q, block_k = ((min(256, n_pad), n_pad) if n_pad <= 4096
                        else (512, 512))

    def local(qs, ks, vs):
        kf = jax.lax.all_gather(ks, seq_axis, axis=1, tiled=True)
        vf = jax.lax.all_gather(vs, seq_axis, axis=1, tiled=True)
        return flash_attention(qs, kf, vf, None, block_q, block_k, kv_valid)

    return shard_map_nocheck(local, mesh, in_specs=(spec, spec, spec),
                             out_specs=spec)(q, k, v)
