"""Training CLI — preserves the reference main.py flag surface for all five
pipelines behind one entry point.

Reference commands map directly, e.g.::

    python vivit_transformer/main.py --data_dir D --train_sampling uniform ...
 -> python -m laryngeal_tpu.cli.main --model vivit --data_dir D --train_sampling uniform ...

(thin per-variant wrappers under the reference directory names are provided
at the repo root so the original commands also work unchanged).

Flag parity sources: vivit_transformer/main.py:16-64,
resnet50-2d-lstm/main.py:21-64, resnet50-3d-video/main.py, timesformer/
main.py, videoswintransformer/main.py:41-45. TPU-specific additions:
--mesh_data (data-parallel device count), --crop_size, --bf16.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
from pathlib import Path

import numpy as np


def build_parser(model_default: str = None) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native laryngeal video classifier training")
    p.add_argument("--model", type=str, default=model_default,
                   choices=["vivit", "timesformer", "resnet3d", "resnet50_lstm", "swin3d"],
                   required=model_default is None)
    # Data.
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--test_data_dir", "--test_dir", dest="test_data_dir",
                   type=str, default=None)
    p.add_argument("--log_dir", type=str, default="logs")
    p.add_argument("--model_dir", type=str, default=None,
                   help="Directory for best-model checkpoints (default: experiment dir)")
    p.add_argument("--train_sampling", type=str, default="uniform",
                   choices=["uniform", "random", "random_window"])
    p.add_argument("--val_sampling", type=str, default="uniform",
                   choices=["uniform", "random", "random_window"])
    p.add_argument("--test_sampling", type=str, default="uniform",
                   choices=["uniform", "random", "random_window"])
    p.add_argument("--num_frames", "--sequence_length", dest="num_frames",
                   type=int, default=None)
    # Model.
    p.add_argument("--model_name", type=str, default=None,
                   help="Pretrained id (informational; weights load via --torch_weights)")
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--model_size", type=str, default="tiny",
                   help="swin3d size: tiny|small|base|base_in22k")
    p.add_argument("--pretrained", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="Start from the reference-default pretrained weights "
                        "(HF k400 for vivit/timesformer, torchvision Kinetics "
                        "for swin3d, ImageNet trunk for resnet50_lstm; "
                        "resnet3d is random-init in the reference). Fetched "
                        "from local caches or the network; on failure a LOUD "
                        "random-init warning fires. --no-pretrained disables.")
    p.add_argument("--torch_weights", type=str, default=None,
                   help="Path to a torch state_dict (.pth/.npz) to convert and load")
    p.add_argument("--hidden_size", type=int, default=None,
                   help="resnet50_lstm LSTM width (default 256); for "
                        "vivit/timesformer, an explicit transformer width "
                        "override (small-scale experiments / parity runs)")
    p.add_argument("--num_layers", type=int, default=None,
                   help="resnet50_lstm LSTM depth (default 2); for "
                        "vivit/timesformer, encoder depth override")
    p.add_argument("--num_heads", type=int, default=None,
                   help="vivit/timesformer attention heads override")
    p.add_argument("--intermediate_size", type=int, default=None,
                   help="vivit/timesformer MLP width override")
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--stochastic_depth", type=float, default=None,
                   help="swin3d only: override the torchvision-parity "
                        "stochastic-depth rate (default 0.1); 0 disables "
                        "drop-path (used by the deterministic train A/B)")
    # Training.
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_workers", type=int, default=2,
                   help="Accepted for CLI parity; the TPU pipeline uses a "
                        "prefetch thread instead of worker processes")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--patience", type=int, default=7)
    p.add_argument("--early_stopping_delta", type=float, default=0.001)
    p.add_argument("--loss_weight", type=float, default=0.3)
    p.add_argument("--acc_threshold", type=float, default=0.02)
    p.add_argument("--weighted_sampling", action="store_true",
                   help="Parsed-but-unused in the reference "
                        "(resnet50-3d-video/main.py:57); accepted for parity")
    p.add_argument("--eval_clips", type=int, default=1,
                   help="Average test predictions over N sampled clips per "
                        "video (clip-averaged eval; stochastic samplers only)")
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="Checkpoint dir to resume mid-training from "
                        "(restores optimizer state + epoch counter), or "
                        "'auto' to pick the newest latest/best checkpoint "
                        "under --log_dir for this model (preemption "
                        "restart: just relaunch with --resume auto)")
    p.add_argument("--save_every", type=int, default=1,
                   help="Write a rolling 'latest' checkpoint every N epochs "
                        "(preemption-safe resume point; 0 disables). Best-"
                        "model checkpoints are separate and unaffected")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="Write a jax.profiler trace of the first train epoch")
    # TPU-native extras.
    p.add_argument("--mesh_data", type=int, default=None,
                   help="Data-parallel device count (default: all devices)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="Model-axis (tensor-parallel) device count; composes "
                        "with --mesh_data on one mesh (Megatron-style "
                        "attention/MLP sharding; vivit/timesformer/swin3d)")
    p.add_argument("--mesh_seq", type=int, default=1,
                   help="Sequence-axis (context-parallel) device count: "
                        "token-sharded activations, k/v all-gathered per "
                        "attention (parallel/sp.py; vivit/timesformer). "
                        "Composes with --mesh_data/--mesh_model on one mesh")
    p.add_argument("--pp_stages", type=int, default=1,
                   help="GPipe pipeline stages: the transformer block stack "
                        "is split into this many stages, one per device "
                        "along a 'stage' mesh axis, with microbatch "
                        "activations ppermute'd stage-to-stage "
                        "(parallel/pp.py; vivit/timesformer). Uses its own "
                        "(data, stage) mesh — exclusive with "
                        "--mesh_model/--mesh_seq")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3-style fully-sharded data parallelism: shard "
                        "every large parameter (and its optimizer moments) "
                        "over the data axis; GSPMD all-gathers params before "
                        "use and reduce-scatters gradients (parallel/"
                        "fsdp.py). Per-device param+opt memory scales down "
                        "with --mesh_data; any model family")
    p.add_argument("--pp_microbatches", type=int, default=None,
                   help="GPipe microbatches per batch (default: pp_stages; "
                        "bubble fraction is (S-1)/(M+S-1), so larger M "
                        "amortizes the pipeline ramp)")
    p.add_argument("--crop_size", type=int, default=224)
    p.add_argument("--grad_accum_steps", type=int, default=1,
                   help="Split each batch into this many micro-batches and "
                        "accumulate gradients inside one jitted step "
                        "(activation memory / grad_accum, identical update "
                        "for BN-free models; batch_size must divide evenly)")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize each transformer block in the backward "
                        "pass (jax.checkpoint): ~30%% more FLOPs for O(layers) "
                        "less activation HBM — e.g. TimeSformer at 32 frames "
                        "OOMs at batch 8 without it (transformer families)")
    p.add_argument("--wire", type=str, default="rgb",
                   choices=("rgb", "i420", "delta", "dct", "dctp"),
                   help="host->device payload format for the training/eval "
                        "feed: rgb (reference parity), i420 (codec-native "
                        "4:2:0 planes, half the bytes, lossless vs source), "
                        "delta (i420 temporal deltas), dct (quantized DCT "
                        "planes, ~1/4 the bytes, bounded loss), dctp (dct "
                        "with nibble-packed high-frequency planes, ~3/4 the "
                        "dct bytes) — the decode fuses into the jitted step")
    p.add_argument("--wire_quality", type=int, default=75,
                   help="dct wire quantizer quality (1-100)")
    p.add_argument("--wire_keep_ac", type=int, default=15,
                   help="dct/dctp wire: zigzag AC planes kept (<=63); fewer "
                        "planes = fewer wire bytes at more quantization "
                        "loss. Default 15 = the measured bench operating "
                        "point; the round-4 learning A/B "
                        "(scripts/ab_train_wire_quality.py) shows k15p8 "
                        "training indistinguishable from k31p14 and the "
                        "rgb control. --wire_keep_ac 31 --wire_pack_from "
                        "14 restores the near-lossless wire")
    p.add_argument("--wire_pack_from", type=int, default=8,
                   help="dctp wire: first zigzag AC plane to nibble-pack "
                        "(planes >= this are clamped to [-8,7])")
    p.add_argument("--wire_lowres", type=int, default=0,
                   help="non-rgb wires: decode the source at 1/2**n "
                        "resolution (native mpeg4 lowres) and carry the "
                        "reduced geometry through the wire - ~4x less "
                        "decode transform work and wire bytes; lossy, "
                        "drift + learning A/B pinned in BASELINE.md")
    p.add_argument("--no_cache_clips", action="store_true")
    p.add_argument("--clip_cache_mb", type=int, default=2048,
                   help="RAM budget (MiB) for the decoded-clip LRU cache")
    p.add_argument("--clip_cache_dir", type=str, default=None,
                   help="Persistent on-disk decoded-clip cache (.npy per "
                        "clip; survives restarts, shared across runs)")
    p.add_argument("--compile_cache_dir", type=str, default=None,
                   help="Persistent XLA compilation cache (also via "
                        "LARYNGEAL_COMPILE_CACHE_DIR); repeat runs skip the "
                        "multi-minute remote train-step compile")
    p.add_argument("--verify_integrity", action="store_true",
                   help="Open and decode-check every video at dataset init, "
                        "dropping unreadable files (the ViViT reference does "
                        "this unconditionally, vivit_transformer/.../"
                        "data_config/dataset.py:48-112)")
    p.add_argument("--decode_workers", type=int, default=None,
                   help="Parallel decode threads per loader (default: auto)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="Multi-process (multi-host) coordinator address "
                        "host:port — process 0's reachable address. Also "
                        "via LARYNGEAL_COORDINATOR. Each process sees its "
                        "local chips; the mesh spans all of them "
                        "(parallel/distributed.py)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="Total process count for --coordinator mode "
                        "(LARYNGEAL_NUM_PROCESSES)")
    p.add_argument("--process_id", type=int, default=None,
                   help="This process's rank for --coordinator mode "
                        "(LARYNGEAL_PROCESS_ID)")
    p.add_argument("--image_size", type=int, default=None,
                   help="Model input size (defaults to crop_size)")
    return p


def run(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ..parallel import distributed
    from ..utils.compile_cache import enable as enable_compile_cache

    # Must happen before the first backend touch: after initialize(),
    # jax.devices() is the GLOBAL device list and the mesh spans every
    # process's chips (ICI within a slice, DCN across hosts).
    distributed.initialize(
        coordinator=getattr(args, "coordinator", None),
        num_processes=getattr(args, "num_processes", None),
        process_id=getattr(args, "process_id", None),
    )

    enable_compile_cache(getattr(args, "compile_cache_dir", None))

    from ..data.pipeline import create_dataloaders
    from ..evals.evaluator import Evaluator
    from ..models.registry import create_model, get_model_spec
    from ..parallel.mesh import make_mesh
    from ..train.checkpoint import load_checkpoint
    from ..train.trainer import Trainer
    from ..utils.logger import ExperimentLogger
    from ..utils.tracking import Tracker

    spec = get_model_spec(args.model)
    num_frames = args.num_frames or spec.default_num_frames
    image_size = args.image_size or args.crop_size

    # Pure flag validation BEFORE the experiment dir exists — a rejected
    # combination must not litter --log_dir with empty run directories.
    if args.remat and args.model not in ("vivit", "timesformer", "swin3d"):
        raise SystemExit("--remat applies to the transformer families "
                         "(vivit/timesformer/swin3d)")
    if args.grad_accum_steps > 1 and args.batch_size % args.grad_accum_steps:
        raise SystemExit(
            f"--batch_size {args.batch_size} must be divisible by "
            f"--grad_accum_steps {args.grad_accum_steps}")

    random.seed(args.seed)
    np.random.seed(args.seed)

    # Multi-process runs share ONE experiment dir (process 0's name is
    # broadcast; per-process timestamps would diverge and rank>0 would never
    # see the checkpoints rank 0 writes); non-primary ranks log to a
    # rank-suffixed file and skip artifact writes.
    is_main = jax.process_index() == 0
    if jax.process_count() > 1:
        from datetime import datetime

        stamp = datetime.now().strftime("%Y%m%d_%H%M%S") if is_main else ""
        name = distributed.broadcast_string(f"{args.model}-classifier-{stamp}")
        exp_logger = ExperimentLogger(
            str(Path(args.log_dir) / name), timestamped=False,
            filename="experiment.log" if is_main
            else f"experiment.rank{jax.process_index()}.log")
    else:
        exp_logger = ExperimentLogger(args.log_dir, prefix=f"{args.model}-classifier")
    logger = exp_logger.get_logger()
    exp_dir = exp_logger.get_experiment_dir()
    logger.info("Arguments: %s", vars(args))
    logger.info("JAX devices: %s", jax.devices())
    if jax.process_count() > 1:
        logger.info("Multi-process: %d processes, this is rank %d (%d local "
                    "of %d global devices)", jax.process_count(),
                    jax.process_index(), jax.local_device_count(),
                    jax.device_count())

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model_kwargs = dict(num_classes=args.num_classes, dtype=dtype)
    if args.model in ("vivit", "timesformer"):
        model_kwargs.update(num_frames=num_frames, image_size=image_size)
        for k in ("hidden_size", "num_layers", "num_heads",
                  "intermediate_size"):
            v = getattr(args, k)
            if v is not None:
                model_kwargs[k] = v
    if args.model == "swin3d":
        model_kwargs.update(model_size=args.model_size)
    if args.remat:
        model_kwargs["remat"] = True
    elif (args.model == "timesformer"
          and num_frames * args.batch_size >= 32 * 8
          and jax.default_backend() == "tpu"):
        # Auto-remat past the measured HBM cliff: TimeSformer at its
        # reference-default 32 frames (timesformer/main.py:39) OOMs a single
        # 16 GB chip at batch 8 without rematerialization (BASELINE.md).
        model_kwargs["remat"] = True
        logger.info(
            "Auto-enabling --remat: timesformer at %d frames x batch %d "
            "exceeds the measured 32fxB8 single-chip HBM cliff", num_frames,
            args.batch_size)
    if args.model == "resnet50_lstm":
        model_kwargs.update(hidden_size=args.hidden_size or 256,
                            num_layers=args.num_layers or 2,
                            dropout=args.dropout)
    if args.model == "resnet3d":
        # Default matches the reference's create_resnet(dropout_rate=0.5)
        # (resnet50-3d-video/.../models/resnet3d.py:12); settable so the
        # cross-framework A/B can pin the un-alignable dropout RNG to off.
        model_kwargs.update(dropout=args.dropout)
    if args.model == "swin3d" and args.stochastic_depth is not None:
        # torchvision swin3d trains with stochastic depth 0.1 (our default,
        # parity with the real reference); the cross-framework train A/B
        # pins the un-alignable drop-path RNG to off on both sides.
        model_kwargs.update(stochastic_depth=args.stochastic_depth)
    model = create_model(args.model, **model_kwargs)

    loaders = create_dataloaders(
        args.data_dir,
        test_data_dir=args.test_data_dir,
        sampling_methods={"train": args.train_sampling, "val": args.val_sampling,
                          "test": args.test_sampling},
        num_frames=num_frames,
        batch_size=args.batch_size,
        seed=args.seed,
        label_policy=spec.label_policy,
        per_video_seed=spec.per_video_seed,
        resize_to=(args.crop_size, args.crop_size) if args.crop_size != 224 else (224, 224),
        pad_last=True,
        cache_clips=not args.no_cache_clips,
        clip_cache_mb=args.clip_cache_mb,
        cache_dir=args.clip_cache_dir,
        verify_integrity=args.verify_integrity,
        num_workers=args.decode_workers,
        wire=args.wire,
        wire_lowres=args.wire_lowres,
        wire_quality=args.wire_quality,
        wire_keep_ac=args.wire_keep_ac,
        wire_pack_from=args.wire_pack_from,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    for split in ("train", "val", "test"):
        ds = loaders[split].dataset
        logger.info("%s: %d videos %s", split, len(ds), ds.class_counts)

    mesh = None
    if args.mesh_seq > 1 and spec.name not in ("vivit", "timesformer"):
        raise SystemExit(
            "--mesh_seq applies to the long-token transformer families "
            "(vivit/timesformer); the windowed/CNN families carry no "
            "global token axis to shard")
    if args.pp_stages > 1:
        if spec.name not in ("vivit", "timesformer"):
            raise SystemExit(
                "--pp_stages applies to the uniform-block-stack transformer "
                "families (vivit/timesformer)")
        if args.mesh_model > 1 or args.mesh_seq > 1:
            raise SystemExit(
                "--pp_stages uses its own (data, stage) mesh and does not "
                "compose with --mesh_model/--mesh_seq")
        from ..parallel.pp import PipelinedModel, make_pp_mesh

        n_data = args.mesh_data or max(1, jax.device_count() // args.pp_stages)
        micro = args.pp_microbatches or args.pp_stages
        if args.batch_size % micro or (args.batch_size // micro) % n_data:
            raise SystemExit(
                f"--batch_size {args.batch_size} must split into "
                f"{micro} microbatches x data-axis {n_data}")
        mesh = make_pp_mesh(n_stage=args.pp_stages, n_data=n_data)
        model = PipelinedModel(model, mesh, micro)
        logger.info("Pipeline mesh: %s (GPipe stages=%d, microbatches=%d)",
                    dict(mesh.shape), args.pp_stages, micro)
    elif args.mesh_model > 1 or args.mesh_seq > 1:
        if args.mesh_model > 1 and spec.name not in (
                "vivit", "timesformer", "swin3d"):
            raise SystemExit(
                "--mesh_model applies to the transformer families "
                "(vivit/timesformer/swin3d); CNN params have no "
                "model-axis layout")
        n_data = args.mesh_data or max(
            1, jax.device_count() // (args.mesh_model * args.mesh_seq))
        if args.batch_size % n_data != 0:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be divisible by the "
                f"data-axis size {n_data}")
        mesh = make_mesh(n_data=n_data, n_model=args.mesh_model,
                         n_seq=args.mesh_seq)
    elif args.mesh_data is None and jax.device_count() > 1:
        from ..parallel.mesh import auto_mesh

        mesh = auto_mesh(args.batch_size)
    elif args.mesh_data and args.mesh_data > 1:
        if args.batch_size % args.mesh_data != 0:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be divisible by "
                f"--mesh_data {args.mesh_data}")
        mesh = make_mesh(n_data=args.mesh_data)
    if mesh is not None:
        logger.info("Mesh: %s (data=%d, seq=%d, model=%d)", dict(mesh.shape),
                    mesh.shape.get("data", 1), mesh.shape.get("seq", 1),
                    mesh.shape.get("model", 1))
        if mesh.shape.get("seq", 1) > 1:
            from ..parallel.sp import enable_sequence_sharding

            # Process-wide: the trainer's jitted steps trace lazily on
            # their first batch, so the constraint state must outlive this
            # function (parallel/sp.py docstring).
            enable_sequence_sharding(mesh)

    if args.fsdp:
        if args.mesh_model > 1 or args.mesh_seq > 1 or args.pp_stages > 1:
            raise SystemExit(
                "--fsdp shards params over the data axis of a plain dp mesh; "
                "it does not compose with --mesh_model/--mesh_seq/--pp_stages")
        if mesh is None:
            raise SystemExit(
                "--fsdp needs a multi-device data mesh (--mesh_data > 1)")

    config = {
        "fsdp": args.fsdp,
        "data_dir": args.data_dir, "test_dir": args.test_data_dir or args.data_dir,
        "train_sampling": args.train_sampling, "val_sampling": args.val_sampling,
        "test_sampling": args.test_sampling, "num_frames": num_frames,
        "batch_size": args.batch_size, "epochs": args.epochs,
        "learning_rate": args.learning_rate or spec.default_lr,
        "weight_decay": (args.weight_decay if args.weight_decay is not None
                         else spec.default_weight_decay),
        "patience": args.patience, "early_stopping_delta": args.early_stopping_delta,
        "loss_weight": args.loss_weight, "acc_threshold": args.acc_threshold,
        "seed": args.seed, "crop_size": args.crop_size,
        "grad_accum_steps": args.grad_accum_steps,
        "save_every": args.save_every,
        "use_early_stopping": spec.name != "swin3d",  # swin trainer never
        # invokes early stopping in the reference (SURVEY.md §2.3)
        # Pin the architecture in checkpoint metadata so inference rebuilds
        # the exact model without re-supplying flags.
        "model_kwargs": {k: v for k, v in model_kwargs.items() if k != "dtype"},
    }
    tracker = (Tracker(config=config, out_dir=exp_dir, run_name=exp_dir.name)
               if is_main else None)

    from ..utils.visualization import TrainingVisualizer

    visualizer = (TrainingVisualizer(exp_logger.get_visualization_dir())
                  if is_main else None)
    # Startup sampling visualizations — up to 3 videos per split
    # (vivit_transformer/main.py:101-137). The ds[i] draws advance
    # stream-seeded sampler RNG, so under multi-process EVERY rank must make
    # them (stream parity across ranks); only the plotting is rank-0.
    for split in ("train", "val", "test"):
        ds = loaders[split].dataset
        for i in range(min(3, len(ds))):
            try:
                item = ds[i]
            except Exception as e:
                logger.warning("Sampling visualization failed: %s", e)
                break  # keep going: later splits still need their draws
            if visualizer is None:
                continue
            try:
                total = ds.video_properties(item["video_path"])[0]
                # Frame grids need RGB regardless of the feed's wire format;
                # reuse the drawn indices (no extra sampler-RNG draw).
                frames = (item["pixel_values"] if ds.wire == "rgb"
                          else ds.rgb_clip(i, indices=item["frame_indices"]))
                visualizer.visualize_sampling(
                    item["video_path"], item["frame_indices"], total,
                    ds.sampling_method, frames=frames,
                )
            except Exception as e:
                logger.warning("Sampling visualization failed: %s", e)

    # Per-video sampled-index CSV audit (resnet3d pipeline behavior,
    # resnet50-3d-video/.../dataset.py:245-288) — only meaningful when
    # sampling is per-video deterministic.
    if spec.per_video_seed and is_main:
        try:
            for split in ("train", "val", "test"):
                path = loaders[split].dataset.save_sampled_indices(exp_dir)
                if path:
                    logger.info("Sampled-indices audit -> %s", path)
        except Exception as e:
            logger.warning("Sampled-indices audit failed: %s", e)

    trainer = Trainer(model, spec, loaders, config, logger=logger,
                      exp_dir=exp_dir, mesh=mesh, tracker=tracker,
                      visualizer=visualizer)

    def _seq_view(state):
        """Weight loaders/converters speak the sequential param layout; give
        them that view of a pipelined state and fold the result back into
        the {"stacked","rest"} stage-sharded layout (parallel/pp.py)."""
        if args.pp_stages <= 1:
            return state, lambda s: s
        from ..parallel.pp import (from_sequential_params, shard_pp_state,
                                   to_sequential_params)

        n_layers = model.config.num_layers
        seq = state.replace(
            params=to_sequential_params(state.params, n_layers))

        def restack(loaded_state):
            new = state.replace(
                params=from_sequential_params(loaded_state.params, n_layers))
            return shard_pp_state(new, mesh)

        return seq, restack

    if args.torch_weights:
        from ..compat.loading import load_torch_weights_into_state

        seq, restack = _seq_view(trainer.state)
        trainer.state = restack(load_torch_weights_into_state(
            seq, args.model, args.torch_weights, logger))
    elif (args.pretrained and not args.checkpoint_path and not args.resume
          and not args.skip_train
          and os.environ.get("LARYNGEAL_PRETRAINED", "1") != "0"):
        from ..compat.pretrained import load_pretrained_into_state

        seq, restack = _seq_view(trainer.state)
        loaded_state, loaded = load_pretrained_into_state(
            seq, args.model, model_size=args.model_size,
            model_id=args.model_name, logger=logger)
        trainer.state = restack(loaded_state)
        if not loaded:
            logger.warning(
                "PRETRAINED WEIGHTS UNAVAILABLE (no cache, no network): "
                "training %s from RANDOM INITIALIZATION. The reference "
                "default fine-tunes pretrained weights — results will NOT "
                "match it. Provide --torch_weights / a populated HF or "
                "torch-hub cache, or pass --no-pretrained to silence this.",
                args.model)

    if args.checkpoint_path:
        logger.info("Loading checkpoint %s", args.checkpoint_path)
        trainer.state = load_checkpoint(args.checkpoint_path, trainer.state)["state"]
    if args.resume == "auto":
        from ..train.checkpoint import find_resume_checkpoint

        found = find_resume_checkpoint(args.log_dir, args.model)
        if found:
            trainer.resume(found)
        else:
            logger.info("--resume auto: no prior checkpoint under %s — "
                        "starting fresh", args.log_dir)
    elif args.resume:
        trainer.resume(args.resume)

    if not args.skip_train:
        from ..utils.profiling import trace as profiler_trace

        with profiler_trace(args.profile_dir):
            trainer.train()

    evaluator = Evaluator(
        trainer.eval_step, loaders["test"],
        class_names=loaders["test"].dataset.class_labels or ["non_referral", "referral"],
        logger=logger, exp_dir=exp_dir if is_main else None, mesh=mesh,
        visualizer=visualizer,
    )
    auroc, f1, cm = evaluator.evaluate(trainer.state, sampling_method=args.test_sampling,
                                       eval_clips=args.eval_clips)
    logger.info("Final test — AUROC %.4f F1 %.4f", auroc, f1)
    if tracker is not None:
        tracker.finish()
    return {"auroc": auroc, "f1": f1, "cm": cm, "exp_dir": str(exp_dir),
            "history": trainer.history}


def main(argv=None, model_default=None):
    args = build_parser(model_default).parse_args(argv)
    return run(args)


if __name__ == "__main__":
    main()
