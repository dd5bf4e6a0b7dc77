"""Convert a torch checkpoint into a laryngeal_tpu orbax checkpoint.

Bridges reference-era artifacts to this framework: feed it an ultralytics
yolov5 .pt export, an HF ViViT/TimeSformer fine-tune, or the reference's own
training checkpoints (model_state_dict dicts, DataParallel prefixes
tolerated), and get a checkpoint directory loadable by --checkpoint_path /
--resume / the inference CLI.

Usage:
    python scripts/port_weights.py --model vivit --torch_weights ck.pth \
        --output converted_ckpt [--num_frames 32] [--num_classes 2]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["vivit", "timesformer", "resnet50_lstm"])
    ap.add_argument("--torch_weights", required=True,
                    help=".pth/.pt state dict or .npz")
    ap.add_argument("--output", required=True, help="checkpoint dir to write")
    ap.add_argument("--num_frames", type=int, default=None)
    ap.add_argument("--num_classes", type=int, default=2)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--num_heads", type=int, default=None,
                    help="attention heads (not inferable from shapes; "
                         "default hidden_size//64)")
    args = ap.parse_args()

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
