"""Convert a torch checkpoint into a laryngeal_tpu orbax checkpoint.

Bridges reference-era artifacts to this framework: feed it an ultralytics
yolov5 .pt export, an HF ViViT/TimeSformer fine-tune, or the reference's own
training checkpoints (model_state_dict dicts, DataParallel prefixes
tolerated), and get a checkpoint directory loadable by --checkpoint_path /
--resume / the inference CLI.

Usage:
    python scripts/port_weights.py --model vivit --torch_weights ck.pth \
        --output converted_ckpt [--num_frames 32] [--num_classes 2]

Dry-run modes (no real weights needed):
    --dry_run               synthesize a manifest-shaped state dict
                            (compat/manifests.py) and run the full
                            convert -> model-shape check for swin3d /
                            resnet3d / yolov5 — validates the porting
                            pipeline before any checkpoint exists.
    --validate_only + --torch_weights
                            diff a real checkpoint's keys/shapes against the
                            manifest and report missing/extra/mismatched,
                            without converting.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MANIFEST_MODELS = ("swin3d", "resnet3d", "yolov5")


def _manifest_for(args):
    from laryngeal_tpu.compat import manifests as MF

    if args.model == "swin3d":
        return MF.swin3d_manifest(args.model_size,
                                  num_classes=args.manifest_classes or 400)
    if args.model == "resnet3d":
        return MF.resnet3d_manifest(num_classes=args.manifest_classes or 2)
    return MF.yolov5_manifest(args.yolo_size,
                              num_classes=args.manifest_classes or 1)


def run_dry_run(args) -> int:
    """Synthesize from the manifest, convert, and diff against model.init."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import flax

    from laryngeal_tpu.compat import manifests as MF
    from laryngeal_tpu.compat import torch_port as tp

    manifest = _manifest_for(args)
    rng = np.random.default_rng(0)
    state = {k: (np.zeros(s, np.int64) if MF.is_ignorable(k)
                 else rng.normal(0, 0.02, s).astype(np.float32))
             for k, s in manifest.items()}

    if args.model == "swin3d":
        from laryngeal_tpu.models.swin3d import create_swin3d

        depths = MF.SWIN3D_SPECS[args.model_size]["depths"]
        converted = {"params": tp.port_swin3d(state, depths=depths)}
        model = create_swin3d(args.model_size,
                              num_classes=args.manifest_classes or 400)
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))
    elif args.model == "resnet3d":
        from laryngeal_tpu.models.resnet3d import create_resnet3d

        converted = tp.port_resnet3d(state)
        model = create_resnet3d(num_classes=args.manifest_classes or 2)
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)))
    else:
        from laryngeal_tpu.models.yolov5 import create_yolov5

        converted = tp.port_yolov5(state, size=args.yolo_size,
                                   num_classes=args.manifest_classes or 1)
        model = create_yolov5(args.yolo_size,
                              num_classes=args.manifest_classes or 1)
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    ok = True
    for col in converted:
        got = {k: tuple(np.asarray(v).shape) for k, v in
               flax.traverse_util.flatten_dict(converted[col], sep="/").items()}
        want = {k: tuple(np.asarray(v).shape) for k, v in
                flax.traverse_util.flatten_dict(init[col], sep="/").items()}
        for k in sorted(set(want) - set(got)):
            print(f"MISSING  {col}/{k}")
            ok = False
        for k in sorted(set(got) - set(want)):
            print(f"EXTRA    {col}/{k}")
            ok = False
        for k in sorted(set(got) & set(want)):
            if got[k] != want[k]:
                print(f"SHAPE    {col}/{k}: converted {got[k]} != model {want[k]}")
                ok = False
    print(f"dry-run {'OK' if ok else 'FAILED'}: {args.model} "
          f"({len(manifest)} manifest tensors)")
    return 0 if ok else 1


def run_validate_only(args) -> int:
    from laryngeal_tpu.compat import manifests as MF
    from laryngeal_tpu.compat.loading import load_torch_state_dict

    sd = load_torch_state_dict(args.torch_weights)
    manifest = _manifest_for(args)
    missing, extra, mismatched = MF.validate_state_dict(
        sd, manifest, allow_extra=args.allow_extra)
    for k in missing:
        print(f"MISSING  {k} {manifest[k]}")
    for k in extra:
        print(f"EXTRA    {k} {tuple(getattr(sd[k], 'shape', ()))}")
    for k, got, want in mismatched:
        print(f"SHAPE    {k}: checkpoint {got} != manifest {want}")
    ok = not (missing or extra or mismatched)
    print(f"validation {'OK' if ok else 'FAILED'}: "
          f"{len(sd)} checkpoint tensors vs {len(manifest)} manifest entries")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["vivit", "timesformer", "resnet50_lstm",
                             "swin3d", "resnet3d", "yolov5"])
    ap.add_argument("--torch_weights", default=None,
                    help=".pth/.pt state dict or .npz")
    ap.add_argument("--output", default=None, help="checkpoint dir to write")
    ap.add_argument("--num_frames", type=int, default=None)
    ap.add_argument("--num_classes", type=int, default=2)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--num_heads", type=int, default=None,
                    help="attention heads (not inferable from shapes; "
                         "default hidden_size//64)")
    ap.add_argument("--model_size", default="tiny",
                    help="swin3d: tiny|small|base|base_in22k")
    ap.add_argument("--yolo_size", default="s")
    ap.add_argument("--manifest_classes", type=int, default=None,
                    help="head classes for manifest modes (default: the "
                         "pretrained checkpoint's: 400 swin3d / 2 resnet3d / "
                         "1 yolov5)")
    ap.add_argument("--dry_run", action="store_true",
                    help="validate manifest->converter->model shapes with "
                         "synthetic weights (swin3d/resnet3d/yolov5)")
    ap.add_argument("--validate_only", action="store_true",
                    help="diff --torch_weights against the manifest, no "
                         "conversion")
    ap.add_argument("--allow_extra", action="store_true",
                    help="tolerate unknown checkpoint keys in --validate_only")
    args = ap.parse_args()

    if args.dry_run:
        if args.model not in MANIFEST_MODELS:
            ap.error(f"--dry_run supports {MANIFEST_MODELS}")
        raise SystemExit(run_dry_run(args))
    if args.validate_only:
        if args.model not in MANIFEST_MODELS:
            ap.error(f"--validate_only supports {MANIFEST_MODELS}")
        if not args.torch_weights:
            ap.error("--validate_only needs --torch_weights")
        raise SystemExit(run_validate_only(args))
    if not args.torch_weights or not args.output:
        ap.error("conversion needs --torch_weights and --output")
    if args.model == "yolov5":
        ap.error("yolov5 weights are consumed directly by preprocess.yolo_roi "
                 "(port_yolov5); use --dry_run/--validate_only here")

    import jax
    import jax.numpy as jnp

    from laryngeal_tpu.compat.loading import load_torch_weights_into_state
    from laryngeal_tpu.models.registry import create_model, get_model_spec
    from laryngeal_tpu.train.checkpoint import save_checkpoint
    from laryngeal_tpu.train.state import create_train_state

    from laryngeal_tpu.compat.loading import load_torch_state_dict

    spec = get_model_spec(args.model)
    num_frames = args.num_frames or spec.default_num_frames
    kwargs = dict(num_classes=args.num_classes)
    sd = load_torch_state_dict(args.torch_weights)
    if args.model in ("vivit", "timesformer"):
        # Infer the architecture from tensor shapes so the Flax model
        # matches any fine-tune size, not just the -B defaults.
        prefix = "vivit" if args.model == "vivit" else "timesformer"
        hidden = int(sd[f"{prefix}.embeddings.cls_token"].shape[-1])
        layers = 1 + max(int(k.split(".")[3]) for k in sd
                         if k.startswith(f"{prefix}.encoder.layer."))
        inter = int(sd[f"{prefix}.encoder.layer.0.intermediate.dense.weight"].shape[0])
        if args.model == "vivit":
            patch = sd[f"{prefix}.embeddings.patch_embeddings.projection.weight"]
            tub_t, tub_s = int(patch.shape[2]), int(patch.shape[3])
            n_patches = int(sd[f"{prefix}.embeddings.position_embeddings"].shape[1]) - 1
            t_tokens = num_frames // tub_t
            if n_patches % t_tokens:
                raise SystemExit(
                    f"checkpoint has {n_patches} patch tokens, not divisible by "
                    f"{t_tokens} temporal tokens — pass the checkpoint's real "
                    f"--num_frames (got {num_frames})")
            spatial = int(round((n_patches / t_tokens) ** 0.5))
            if spatial * spatial * t_tokens != n_patches:
                raise SystemExit(
                    f"cannot factor {n_patches} patch tokens into "
                    f"{t_tokens} x S^2 — wrong --num_frames for this checkpoint?")
            image_size = spatial * tub_s
        else:
            n_spatial = int(sd[f"{prefix}.embeddings.position_embeddings"].shape[1]) - 1
            patch = int(sd[f"{prefix}.embeddings.patch_embeddings.projection.weight"].shape[2])
            image_size = int(round(n_spatial ** 0.5)) * patch
            num_frames = int(sd[f"{prefix}.embeddings.time_embeddings"].shape[1])
        kwargs.update(num_frames=num_frames, image_size=image_size,
                      hidden_size=hidden, num_layers=layers,
                      num_heads=args.num_heads or max(hidden // 64, 1),
                      intermediate_size=inter)
        print(f"Inferred architecture: {kwargs}")
    elif args.model == "resnet50_lstm":
        # Infer LSTM geometry from the checkpoint tensors.
        hidden = int(sd["lstm.weight_ih_l0"].shape[0]) // 4
        layers = 1 + max(int(k.rsplit("_l", 1)[1]) for k in sd
                         if k.startswith("lstm.weight_ih_l"))
        kwargs.update(hidden_size=hidden, num_layers=layers,
                      num_frames=num_frames)
        print(f"Inferred architecture: {kwargs}")
    elif args.model == "swin3d":
        kwargs.update(model_size=args.model_size,
                      num_classes=int(sd["head.weight"].shape[0]))
        print(f"Inferred architecture: {kwargs}")
    elif args.model == "resnet3d":
        kwargs.update(num_classes=int(sd["blocks.5.proj.weight"].shape[0]))
        print(f"Inferred architecture: {kwargs}")
    model = create_model(args.model, **kwargs)

    image_size = kwargs.get("image_size", args.image_size)
    num_frames = kwargs.get("num_frames", num_frames)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, num_frames, image_size, image_size, 3)),
        optimizer=spec.optimizer, learning_rate=spec.default_lr,
        weight_decay=spec.default_weight_decay,
    )
    state = load_torch_weights_into_state(state, args.model, args.torch_weights,
                                          sd=sd)
    path = save_checkpoint(
        args.output, state, epoch=0,
        config={"source": str(args.torch_weights), "model": args.model,
                "num_frames": num_frames,
                # Pin the architecture so Predictor.from_checkpoint rebuilds
                # the exact model without CLI guesswork.
                "model_kwargs": kwargs},
        class_labels=["non_referral", "referral"],
    )
    print(f"Converted checkpoint written to {path}")


if __name__ == "__main__":
    main()
