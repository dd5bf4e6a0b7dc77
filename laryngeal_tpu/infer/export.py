"""AOT inference export — self-contained StableHLO artifacts (jax.export).

Production deployment wants an artifact that serves WITHOUT the model zoo,
converter stack, or any Python model code: ``export_predictor`` AOT-lowers
the Predictor's fused uint8-clip -> probabilities graph (preprocess +
backbone + probs, checkpoint weights baked in as constants) once per
requested batch size and serializes each with ``jax.export`` (StableHLO +
calling convention, forward-compatible across jax releases). ``ExportedModel``
restores callables from the bytes alone and routes a request batch to the
smallest exported batch size that fits (zero-padding the tail and trimming
the result) — the same fixed-shape discipline the serving path uses, so a
deployed artifact never triggers a recompile.

Artifact layout (single ``.zip`` file):
    meta.json      {"model", "class_labels", "num_frames", "crop_size",
                    "sampling_method", "batch_sizes", "platforms",
                    "weights_mode", ...}
    b{N}.bin       jax.export serialization of the N-clip graph
    w{K}.raw       (weights_mode="args" only) the K-th weight leaf's raw
                   bytes; shapes/dtypes in meta["weights_manifest"]

``weights_mode``: "baked" (default) folds the weights into every graph as
StableHLO constants — maximally self-contained, but a multi-batch-size
artifact stores the weights once PER GRAPH (measured: a (1,2,4,8) int8
ViViT-B artifact is 354 MB vs 97 MB single-size). "args" exports the
graphs as functions of a flat weight list and stores the weights ONCE in
the zip — a (1,2,4,8) artifact costs one weight set + ~KB-scale graphs,
and the per-graph StableHLO stays small enough for body-size-capped
remote-compile channels (BASELINE.md: the relay 413-rejects ~350 MB baked
f32 graphs). Still fully self-contained: the loader rebuilds the leaf list
from the manifest with no model code.

The reference redeploys by re-instantiating the torch module tree and
loading a ``.pth`` (``vivit_transformer/inference.py:31-88``); this replaces
that with one portable file.
"""

from __future__ import annotations

import io
import json
import zipfile
from datetime import datetime
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import VideoPredictorBase

_META_NAME = "meta.json"
# v2: weights_mode="args" artifacts (w{K}.raw leaves + weights_manifest).
# v1 ("baked") artifacts load unchanged; older loaders reject v2 cleanly.
_FORMAT_VERSION = 2


def export_predictor(predictor, batch_sizes: Sequence[int] = (1, 8),
                     platforms: Optional[Sequence[str]] = None,
                     quantize: Optional[str] = None,
                     weights_dtype: Optional[str] = None,
                     weights_mode: str = "baked") -> Dict:
    """AOT-export ``predictor``'s jitted forward at each batch size.

    ``weights_mode="baked"`` closes the weights over (StableHLO constants
    in EVERY graph); ``"args"`` exports graphs as functions of a flat
    weight-leaf list stored once in the artifact (see module docstring for
    the size tradeoff). ``quantize="int8"`` bakes W8A8 dynamically-quantized
    Dense layers instead (``ops.quant``): ~4x smaller artifacts for the
    transformer families at 8e-4 measured probability drift; speed-neutral
    on this chip (the fwd is attention-bound — BASELINE.md), faster where
    the MXU's int8 rate is realized. Returns ``{"meta": dict, "blobs":
    {N: bytes}, ["weights": list]}``; use :func:`save_exported` to write
    the zip.
    """
    from jax import export as jexport

    if weights_mode not in ("baked", "args"):
        raise ValueError(f"unknown weights_mode {weights_mode!r}")

    params = predictor.state.params
    batch_stats = predictor.state.batch_stats
    t, hw = predictor.num_frames, predictor.crop_size

    if weights_dtype == "bf16":
        # Halves baked-constant bytes. Numerically FREE for bf16-compute
        # models (their ops cast f32 params to bf16 at use anyway); for
        # f32-compute models it introduces bf16 rounding on the weights.
        cast = lambda x: (x.astype(jnp.bfloat16)
                          if hasattr(x, "dtype") and x.dtype == jnp.float32
                          else x)
        params = jax.tree_util.tree_map(cast, params)
    elif weights_dtype:
        raise ValueError(f"unknown weights_dtype {weights_dtype!r} (use 'bf16')")

    quant_paths = None
    if quantize == "int8":
        from ..ops.quant import quantize_conv_kernels, quantize_params

        params, quant_paths = quantize_params(params)
        # Conv kernels: weight-only int8 baked as constants, dequantized
        # in-graph (XLA folds it on load) — the size win for the conv
        # families (resnet3d / lstm trunk / patch embeds).
        params, _ = quantize_conv_kernels(params)
    elif quantize:
        raise ValueError(f"unknown quantize mode {quantize!r} (use 'int8')")

    all_variables = {"params": params}
    if batch_stats:
        all_variables["batch_stats"] = batch_stats
    w_leaves, w_treedef = jax.tree_util.tree_flatten(all_variables)

    def apply_model(variables, pixel_u8):
        from ..preprocess.transforms import batch_preprocess
        from ..train.losses import probs_fn

        clips = batch_preprocess(pixel_u8, predictor.spec.preprocess_regime,
                                 train=False, crop=hw)
        if quant_paths is not None:
            from ..ops.quant import quantized_apply

            logits = quantized_apply(predictor.model, variables, clips,
                                     train=False, quantized_paths=quant_paths)
        else:
            logits = predictor.model.apply(variables, clips, train=False)
        return probs_fn(predictor.spec.loss)(logits)

    def forward_baked(pixel_u8):
        # Closing over the weights is what bakes them into the StableHLO.
        return apply_model(all_variables, pixel_u8)

    def forward_args(wlist, pixel_u8):
        # The treedef is trace-time static (closed over); the exported
        # graph's runtime signature is (flat weight list, pixels) — the
        # loader rebuilds the list from the manifest, no model code needed.
        return apply_model(jax.tree_util.tree_unflatten(w_treedef, wlist),
                           pixel_u8)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)

    blobs = {}
    for b in sorted(set(int(b) for b in batch_sizes)):
        spec = jax.ShapeDtypeStruct((b, t, hw, hw, 3), jnp.uint8)
        if weights_mode == "args":
            w_specs = [jax.ShapeDtypeStruct(x.shape, x.dtype)
                       for x in w_leaves]
            exported = jexport.export(jax.jit(forward_args),
                                      **kwargs)(w_specs, spec)
        else:
            exported = jexport.export(jax.jit(forward_baked), **kwargs)(spec)
        blobs[b] = exported.serialize()

    weights_np = ([np.asarray(jax.device_get(x)) for x in w_leaves]
                  if weights_mode == "args" else None)
    meta = {
        "format_version": _FORMAT_VERSION if weights_mode == "args" else 1,
        "weights_mode": weights_mode,
        "weights_manifest": ([{"shape": list(a.shape), "dtype": str(a.dtype)}
                              for a in weights_np]
                             if weights_np is not None else None),
        "model": getattr(predictor.spec, "name", type(predictor.model).__name__),
        "class_labels": list(predictor.class_labels),
        "num_frames": int(t),
        "crop_size": int(hw),
        "sampling_method": predictor.sampling_method,
        "per_video_seed": bool(getattr(predictor.spec, "per_video_seed", False)),
        "quantize": quantize,
        "weights_dtype": weights_dtype or "f32",
        "batch_sizes": sorted(blobs),
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "exported_at": datetime.now().isoformat(),
        "jax_version": jax.__version__,
    }
    out = {"meta": meta, "blobs": blobs}
    if weights_np is not None:
        out["weights"] = weights_np
    return out


def save_exported(artifact: Dict, path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META_NAME, json.dumps(artifact["meta"], indent=2))
        for b, blob in artifact["blobs"].items():
            zf.writestr(f"b{b}.bin", blob)
        for k, arr in enumerate(artifact.get("weights") or ()):
            # Raw bytes + manifest (meta.weights_manifest): np.savez can't
            # round-trip bf16/ml_dtypes leaves, tobytes/frombuffer can.
            zf.writestr(f"w{k}.raw", np.ascontiguousarray(arr).tobytes())
    path.write_bytes(buf.getvalue())  # single atomic-ish write
    return path


class ExportedModel:
    """A deserialized inference artifact: uint8 clips -> probabilities.

    No model code, converters, or checkpoints required — only jax and the
    bytes. Batches route to the smallest exported graph that fits; the tail
    is zero-padded and the padded rows' outputs dropped.
    """

    def __init__(self, meta: Dict, exported_by_batch: Dict[int, "object"],
                 weights: Optional[List] = None):
        self.meta = meta
        self.class_labels: List[str] = list(meta["class_labels"])
        self.num_frames: int = meta["num_frames"]
        self.crop_size: int = meta["crop_size"]
        self._by_batch = dict(sorted(exported_by_batch.items()))
        if weights is not None:
            # args-mode artifact: graphs take (weight list, pixels); stage
            # the weights on device ONCE and pass them as runtime arguments.
            # (Closing the jit over w_dev would trace them as constants and
            # re-embed a weight copy in every bucket's executable — exactly
            # the per-graph duplication args mode exists to avoid.)
            w_dev = [jnp.asarray(a) for a in weights]
            self._calls = {
                b: (lambda jf: lambda chunk: jf(w_dev, chunk))(jax.jit(e.call))
                for b, e in self._by_batch.items()}
        else:
            self._calls = {b: jax.jit(e.call)
                           for b, e in self._by_batch.items()}

    @classmethod
    def load(cls, path) -> "ExportedModel":
        from jax import export as jexport

        with zipfile.ZipFile(Path(path)) as zf:
            meta = json.loads(zf.read(_META_NAME))
            if meta.get("format_version", 0) > _FORMAT_VERSION:
                raise ValueError(
                    f"artifact format {meta['format_version']} is newer than "
                    f"this loader ({_FORMAT_VERSION})")
            exported = {
                int(name[1:-4]): jexport.deserialize(zf.read(name))
                for name in zf.namelist()
                if name.startswith("b") and name.endswith(".bin")
            }
            weights = None
            if meta.get("weights_mode") == "args":
                manifest = meta["weights_manifest"]
                weights = []
                for k, entry in enumerate(manifest):
                    raw = zf.read(f"w{k}.raw")
                    arr = np.frombuffer(
                        raw, dtype=jnp.dtype(entry["dtype"])).reshape(
                            entry["shape"])
                    weights.append(arr)
        if not exported:
            raise ValueError(f"no exported graphs in {path}")
        # Fail with a clear message now, not a cryptic lowering error at the
        # first call: AOT artifacts only run on the platforms they were
        # lowered for.
        backend = jax.default_backend()
        platforms = [p.lower() for p in meta.get("platforms", [])]
        if platforms and backend.lower() not in platforms:
            raise ValueError(
                f"artifact {path} was exported for platforms {platforms} "
                f"but the current jax backend is {backend!r}; re-export "
                f"with platforms=[{backend!r}] (cli.export --platforms) or "
                f"load it on matching hardware")
        return cls(meta, exported, weights=weights)

    @property
    def batch_sizes(self) -> List[int]:
        return list(self._by_batch)

    def predict(self, clips_u8) -> np.ndarray:
        """(B,T,H,W,C) or (T,H,W,C) uint8 -> (B, num_classes) float probs.

        Accepts numpy or device arrays; a device array whose batch exactly
        matches an exported graph runs directly (no host round-trip — the
        batch-serving path stages batches on device already)."""
        if isinstance(clips_u8, jax.Array) and clips_u8.ndim == 5:
            b = int(clips_u8.shape[0])
            fit = next((s for s in self.batch_sizes if s >= b), None)
            if fit is not None:
                chunk = (clips_u8 if fit == b else jnp.pad(
                    clips_u8, [(0, fit - b)] + [(0, 0)] * 4))
                return np.asarray(self._calls[fit](chunk)[:b])
            # b exceeds every exported size: fall through to host chunking.
        clips_u8 = np.asarray(clips_u8, dtype=np.uint8)
        if clips_u8.ndim == 4:
            clips_u8 = clips_u8[None]
        b = clips_u8.shape[0]
        if b == 0:
            return np.zeros((0, len(self.class_labels)), np.float32)
        sizes = self.batch_sizes
        out = []
        done = 0
        while done < b:
            remaining = b - done
            # Smallest exported size that fits the remainder; largest if none.
            fit = next((s for s in sizes if s >= remaining), sizes[-1])
            take = min(fit, remaining)
            chunk = clips_u8[done:done + take]
            if take < fit:
                pad = np.zeros((fit - take,) + chunk.shape[1:], np.uint8)
                chunk = np.concatenate([chunk, pad], axis=0)
            probs = np.asarray(self._calls[fit](jnp.asarray(chunk)))
            out.append(probs[:take])
            done += take
        return np.concatenate(out, axis=0)


class ExportedPredictor(VideoPredictorBase):
    """Artifact-backed drop-in for ``infer.predictor.Predictor``.

    Inherits the host-side sampling/decode/batching/result machinery from
    ``infer.base`` (which pulls in no model code), so the inference CLI and
    server work end-to-end with only the artifact bytes on the host.
    """

    def __init__(self, exported: ExportedModel, logger=None):
        import logging
        from types import SimpleNamespace

        from ..data.samplers import FrameSampler

        meta = exported.meta
        self.exported = exported
        self.model = None
        self.spec = SimpleNamespace(name=meta.get("model"),
                                    per_video_seed=meta.get("per_video_seed", False))
        # predict_videos passes state fields into _forward; the artifact
        # ignores them (weights are baked into the graph).
        self.state = SimpleNamespace(params=None, batch_stats=None)
        self.class_labels = list(exported.class_labels)
        self.num_frames = exported.num_frames
        self.sampling_method = meta.get("sampling_method", "uniform")
        self.crop_size = exported.crop_size
        self.logger = logger or logging.getLogger(__name__)
        self.sampler = FrameSampler(self.sampling_method, self.num_frames,
                                    per_video_seed=self.spec.per_video_seed)
        # Device batches from predict_videos run the exported graph directly
        # (ExportedModel.predict's device fast path) — no host round-trip.
        self._forward = lambda params, batch_stats, pixel_u8: (
            exported.predict(pixel_u8))

    @classmethod
    def load(cls, path, logger=None) -> "ExportedPredictor":
        return cls(ExportedModel.load(path), logger=logger)

    def predict_clip(self, clip_u8: np.ndarray) -> np.ndarray:
        """Host clips go straight to the artifact (its own batch routing
        pads/uploads once) instead of the base's upload-then-forward."""
        clip_u8 = np.asarray(clip_u8)
        if clip_u8.ndim == 4:
            clip_u8 = clip_u8[None]
        return self.exported.predict(clip_u8)


def export_checkpoint(model_name: str, checkpoint_path, out_path,
                      batch_sizes: Sequence[int] = (1, 8),
                      platforms: Optional[Sequence[str]] = None,
                      quantize: Optional[str] = None,
                      weights_dtype: Optional[str] = None,
                      weights_mode: str = "baked",
                      **predictor_kwargs) -> Path:
    """Checkpoint dir -> serialized artifact file (CLI entry's core)."""
    from .predictor import Predictor

    predictor = Predictor.from_checkpoint(model_name, checkpoint_path,
                                          **predictor_kwargs)
    artifact = export_predictor(predictor, batch_sizes, platforms,
                                quantize=quantize, weights_dtype=weights_dtype,
                                weights_mode=weights_mode)
    return save_exported(artifact, out_path)
