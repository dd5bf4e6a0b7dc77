"""Trainer — the single epoch-loop framework behind all five pipelines.

Replaces the reference's five near-identical ModelTrainer classes
(vivit_transformer/.../trainers/trainer.py:106-307, resnet50-2d-lstm/src/
trainer/trainer.py:124-398, resnet50-3d-video/.../trainers/trainer.py:72-160,
...): per-epoch train/val phases with loss/accuracy/AUROC history, LR
plateau scheduling (2d-lstm), the variant's model-selection policy,
early stopping, checkpoint-on-best, wandb/JSONL tracking, history JSON, and
best-model reload at the end.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..evals import metrics as M
from ..models.registry import ModelSpec
from .checkpoint import load_checkpoint, save_checkpoint
from .losses import reference_pos_weight
from .selection import EarlyStopping, ReduceLROnPlateau, make_selection
from .state import TrainState, create_train_state, get_learning_rate, set_learning_rate
from .steps import make_eval_step, make_train_step, prepare_batch


class Trainer:
    def __init__(
        self,
        model,
        spec: ModelSpec,
        loaders: Dict,
        config: Dict,
        logger=None,
        exp_dir=None,
        mesh=None,
        tracker=None,
        visualizer=None,
        rng: Optional[jax.Array] = None,
    ):
        import logging

        self.model = model
        self.spec = spec
        self.loaders = loaders
        self.config = dict(config)
        self.logger = logger or logging.getLogger(__name__)
        self.exp_dir = Path(exp_dir) if exp_dir else Path("runs")
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh
        self.tracker = tracker
        self.visualizer = visualizer
        self.rng = rng if rng is not None else jax.random.PRNGKey(config.get("seed", 42))

        train_ds = loaders["train"].dataset
        self.class_labels = train_ds.class_labels

        # Class weighting (2d-lstm: BCE pos_weight from train distribution).
        pos = int(sum(train_ds.labels))
        neg = len(train_ds.labels) - pos
        self.pos_weight = (
            reference_pos_weight(pos, neg) if spec.loss == "bce_pos_weight" else 1.0
        )
        if spec.loss == "bce_pos_weight":
            self.logger.info("BCE pos_weight = %.4f (pos=%d neg=%d)", self.pos_weight, pos, neg)

        # State + steps. Shapes come from the dataset config — materializing
        # a batch here would decode video and leave a blocked prefetch thread.
        t = loaders["val"].dataset.num_frames
        c = 3
        init_rng, self.rng = jax.random.split(self.rng)
        trainable_mask_fn = None
        if spec.name == "resnet50_lstm":
            from ..models.resnet import backbone_param_mask

            trainable_mask_fn = backbone_param_mask
        self.crop = int(config.get("crop_size", 224))
        self.state = create_train_state(
            model,
            init_rng,
            jax.numpy.zeros((1, t, self.crop, self.crop, c), jax.numpy.float32),
            optimizer=spec.optimizer,
            learning_rate=config.get("learning_rate", spec.default_lr),
            weight_decay=config.get("weight_decay", spec.default_weight_decay),
            trainable_mask_fn=trainable_mask_fn,
        )
        # Model-axis (tensor) parallelism when the mesh carries a model
        # dimension; GPipe stage sharding for a PipelinedModel (parallel/
        # pp.py); plain replication otherwise.
        self.tp = mesh is not None and mesh.shape.get("model", 1) > 1
        self.pp = bool(getattr(model, "is_pipelined", False))
        self.fsdp = mesh is not None and bool(config.get("fsdp"))
        if self.tp:
            from ..parallel.tp import shard_train_state

            self.state = shard_train_state(self.state, mesh)
        elif self.pp:
            from ..parallel.pp import shard_pp_state

            self.state = shard_pp_state(self.state, mesh)
        elif self.fsdp:
            from ..parallel.fsdp import shard_train_state_fsdp

            self.state = shard_train_state_fsdp(self.state, mesh)
        elif mesh is not None:
            from ..parallel.mesh import replicate

            self.state = replicate(mesh, self.state)

        # tp, pp and fsdp all carry non-replicated state shardings that must
        # propagate through the step instead of being forced to replicate.
        free_state = self.tp or self.pp or self.fsdp
        # The steps decode whatever wire format the loaders ship (the
        # dataset owns the choice — see VideoDataset(wire=...)).
        wire = getattr(train_ds, "wire", "rgb")
        wire_hw = None
        if wire in ("dct", "dctp"):
            # The dataset's wire_wh is the (possibly lowres-reduced) payload
            # geometry; decode wants (h, w).
            ww, wh = getattr(train_ds, "wire_wh",
                             train_ds.resize_to or (224, 224))
            wire_hw = (wh, ww)
        wire_kw = dict(wire=wire, wire_hw=wire_hw,
                       wire_quality=getattr(train_ds, "wire_quality", 75),
                       wire_keep_ac=getattr(train_ds, "wire_keep_ac", 31))
        self.train_step = make_train_step(
            model, spec.preprocess_regime, spec.loss, self.pos_weight, mesh,
            crop=self.crop, grad_accum=int(config.get("grad_accum_steps", 1)),
            tp=free_state, **wire_kw,
        )
        self.eval_step = make_eval_step(
            model, spec.preprocess_regime, spec.loss, self.pos_weight, mesh,
            crop=self.crop, tp=free_state, **wire_kw,
        )

        # Policies.
        self.selection = make_selection(
            spec.selection,
            loss_weight=config.get("loss_weight", 0.3),
            acc_threshold=config.get("acc_threshold", 0.02),
        )
        self.early_stopping = EarlyStopping(
            patience=config.get("patience", 7),
            delta=config.get("early_stopping_delta", 0.0),
        ) if config.get("use_early_stopping", True) else None
        self.plateau = (
            ReduceLROnPlateau(
                lr=config.get("learning_rate", spec.default_lr),
                mode="max", factor=0.5, patience=5,
            )
            if config.get("lr_plateau", spec.name == "resnet50_lstm")
            else None
        )

        self.history: Dict = {
            "train_loss": [], "val_loss": [],
            "train_acc": [], "val_acc": [],
            "train_auroc": [], "val_auroc": [],
            "lr": [], "epoch_time": [],
        }
        self.start_epoch = 0
        self.best_path = self.exp_dir / "best_model"
        # Multi-process (multi-host) mode: every process runs the identical
        # SPMD loop on its shard of each batch; artifacts (checkpoints,
        # history JSON, plots, tracker events) are written by process 0 only.
        self.multiprocess = jax.process_count() > 1
        self.is_main_process = jax.process_index() == 0
        if self.multiprocess:
            from ..parallel.distributed import local_batch_slice

            # Fail fast if the mesh's data-axis layout doesn't match the
            # contiguous per-process shard the ClipLoader feeds.
            local_batch_slice(mesh, int(config.get("batch_size", 4)))
        if self.is_main_process:
            self._save_config()

    def resume(self, checkpoint_path) -> int:
        """True mid-training resume: restore the full TrainState (params,
        optimizer moments, BN stats, step), history, and epoch counter. The
        reference saves optimizer state but never reloads it (SURVEY.md §5 —
        'no mid-training resume'); this closes that gap."""
        restored = load_checkpoint(checkpoint_path, self.state)
        self.state = restored["state"]
        for k, v in restored["history"].items():
            if k in self.history and isinstance(v, list):
                self.history[k] = list(v)
        self.start_epoch = int(restored["epoch"]) + 1
        # Re-prime selection/early-stopping/LR-plateau with the restored
        # history so the resumed schedule matches an uninterrupted run.
        for i, vl in enumerate(self.history.get("val_loss", [])):
            auroc_i = (self.history["val_auroc"][i]
                       if i < len(self.history.get("val_auroc", [])) else 0.0)
            self.selection(val_loss=vl, val_auroc=auroc_i,
                           val_acc=self.history["val_acc"][i]
                           if i < len(self.history.get("val_acc", [])) else 0.0)
            if self.early_stopping is not None:
                self.early_stopping(vl)
            if self.plateau is not None:
                self.plateau.step(auroc_i)
        if self.plateau is not None and self.history.get("lr"):
            self.plateau.lr = self.history["lr"][-1]
        self.logger.info("Resumed from %s at epoch %d", checkpoint_path, self.start_epoch)
        return self.start_epoch

    def _save_config(self):
        cfg = {k: str(v) if isinstance(v, Path) else v for k, v in self.config.items()}
        cfg["model"] = self.spec.name
        with open(self.exp_dir / "training_config.json", "w") as f:
            json.dump(cfg, f, indent=4, default=str)

    def _run_epoch(self, split: str, train: bool, epoch: int = None) -> Dict:
        """One pass over a split with *device-side* metric accumulation.

        Per-batch metrics stay on device (appending a jax.Array to a Python
        list does not synchronize); the host fetches everything in ONE
        device_get at epoch end. The reference fetches per batch
        (trainer.py:149-163 accumulates host floats) — on the axon relay
        (~0.5 s/fetch) that serializes compute with host round-trips and
        defeats the prefetch pipeline.
        """
        import jax.numpy as jnp

        mp = self.multiprocess
        if mp:
            from ..parallel.distributed import fetch_replicated

        if train and epoch is not None and hasattr(self.loaders[split], "set_epoch"):
            # Absolute-epoch shuffle seed: resumed runs reproduce the
            # uninterrupted run's batch order (ClipLoader.set_epoch).
            self.loaders[split].set_epoch(epoch)
        dev_metrics, probs_dev, masks_host, labels_host = [], [], [], []
        t_start = time.time()
        rng_in = np.asarray(self.rng) if mp else self.rng
        for batch in self.loaders[split]:
            pixel, labels, mask = prepare_batch(batch, self.mesh)
            if train:
                self.state, m = self.train_step(self.state, pixel, labels, mask, rng_in)
            else:
                m = self.eval_step(self.state, pixel, labels, mask)
            if mp:
                # Multi-process arrays can't be stacked eagerly on host; the
                # step's metrics are replicated, so fetch per batch (each
                # host sees the global values — no relay here, local chips).
                m = fetch_replicated(m)
            dev_metrics.append((m["loss"], m["correct"], m["count"]))
            probs_dev.append(m["probs"])
            # Under multi-process feed the loader ships its local shard as
            # labels/mask and the full global batch as *_global for metrics.
            masks_host.append(np.asarray(batch.get("mask_global", batch["mask"])))
            labels_host.append(np.asarray(batch.get("labels_global", batch["labels"])))

        if dev_metrics:
            # One fused fetch: (3, n_batches) scalars + concatenated probs.
            if mp:
                scalars = np.asarray(dev_metrics, dtype=np.float64)
                probs = np.concatenate(probs_dev, axis=0)
            else:
                scalars, probs = jax.device_get((
                    jnp.asarray(dev_metrics), jnp.concatenate(probs_dev, axis=0)))
            # Host-side float64 reduction in batch order — numerically
            # identical to the per-batch float() accumulation it replaces.
            losses = [float(x) for x in scalars[:, 0]]
            correct = sum(float(x) for x in scalars[:, 1])
            count = sum(float(x) for x in scalars[:, 2])
            valid = np.concatenate(masks_host)
            probs = np.asarray(probs)[valid]
            labels = np.concatenate(labels_host)[valid]
        else:
            losses, correct, count = [], 0.0, 0.0
            probs = np.zeros((0, 2))
            labels = np.zeros((0,), int)
        auroc = 0.0
        if labels.size and np.unique(labels).size > 1:
            auroc = M.roc_auc_score(labels, probs[:, 1])
        return {
            "loss": float(np.mean(losses)) if losses else 0.0,
            "acc": correct / max(count, 1.0),
            "auroc": auroc,
            "clips_per_sec": count / max(time.time() - t_start, 1e-6),
        }

    def train(self) -> TrainState:
        epochs = int(self.config.get("epochs", 1))
        best_epoch = -1
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            tr = self._run_epoch("train", train=True, epoch=epoch)
            va = self._run_epoch("val", train=False)
            dt = time.time() - t0

            lr = get_learning_rate(self.state)
            if self.plateau is not None:
                self.plateau.lr = lr
                new_lr = self.plateau.step(va["auroc"])
                if new_lr != lr:
                    self.logger.info("ReduceLROnPlateau: lr %.2e -> %.2e", lr, new_lr)
                    self.state = set_learning_rate(self.state, new_lr)
                    lr = new_lr

            for k, v in (("train_loss", tr["loss"]), ("val_loss", va["loss"]),
                         ("train_acc", tr["acc"]), ("val_acc", va["acc"]),
                         ("train_auroc", tr["auroc"]), ("val_auroc", va["auroc"]),
                         ("lr", lr), ("epoch_time", dt)):
                self.history[k].append(v)

            self.logger.info(
                "Epoch %d/%d — train loss %.4f acc %.4f auroc %.4f | "
                "val loss %.4f acc %.4f auroc %.4f | lr %.2e | %.1fs "
                "(%.1f clips/s train)",
                epoch + 1, epochs, tr["loss"], tr["acc"], tr["auroc"],
                va["loss"], va["acc"], va["auroc"], lr, dt,
                tr["clips_per_sec"],
            )
            if self.tracker is not None and self.is_main_process:
                self.tracker.log(
                    {"epoch": epoch + 1, **{f"train/{k}": v for k, v in tr.items()},
                     **{f"val/{k}": v for k, v in va.items()}, "lr": lr},
                    step=epoch + 1,
                )

            if self.selection(val_loss=va["loss"], val_auroc=va["auroc"], val_acc=va["acc"]):
                best_epoch = epoch
                # Every process calls (orbax save syncs internally under
                # multi-process); file writes happen on process 0 only.
                save_checkpoint(
                    self.best_path, self.state, epoch=epoch, history=self.history,
                    config=self.config, class_labels=self.class_labels,
                )
                if self.is_main_process:
                    self.logger.info("Saved best model (epoch %d) to %s", epoch + 1, self.best_path)

            # Preemption-safe rolling checkpoint: every save_every epochs a
            # 'latest' checkpoint (full TrainState + history + epoch) is
            # written alongside best. A preempted run resumes from the last
            # *epoch*, not the last *improvement* (which on a plateau can be
            # arbitrarily far back). The reference has neither (SURVEY.md §5:
            # save-on-best only, no resume). Write-then-rename in
            # save_checkpoint keeps the previous latest intact if the save
            # itself is interrupted.
            save_every = int(self.config.get("save_every", 1) or 0)
            if save_every and (epoch + 1) % save_every == 0:
                save_checkpoint(
                    self.exp_dir / "latest", self.state, epoch=epoch,
                    history=self.history, config=self.config,
                    class_labels=self.class_labels,
                )

            if self.visualizer is not None and self.is_main_process:
                try:
                    self.visualizer.plot_training_history(self.history)
                except Exception as e:  # visualization must never kill training
                    self.logger.warning("Visualization failed: %s", e)

            if self.early_stopping is not None:
                self.early_stopping(va["loss"])
                if self.early_stopping.should_stop:
                    self.logger.info("Early stopping at epoch %d", epoch + 1)
                    break

        if self.is_main_process:
            with open(self.exp_dir / "training_history.json", "w") as f:
                json.dump(self.history, f, indent=4, default=float)

        if best_epoch >= 0:
            self.logger.info("Reloading best model from epoch %d", best_epoch + 1)
            if self.multiprocess:
                # Checkpoints live on process 0's filesystem (shared in the
                # dryrun); every process restores the same host values from a
                # host-side template and re-replicates over the global mesh.
                from jax.experimental import multihost_utils

                from ..parallel.mesh import replicate

                # Barrier: process 0 may still be renaming the checkpoint
                # written at the final best epoch.
                multihost_utils.sync_global_devices("laryngeal_best_ckpt")

                def _to_np(x):
                    if isinstance(x, jax.Array) and not x.is_fully_addressable:
                        return np.asarray(x.addressable_shards[0].data)
                    return np.asarray(x) if isinstance(x, jax.Array) else x

                host_template = jax.tree_util.tree_map(_to_np, self.state)
                restored = load_checkpoint(self.best_path, host_template)["state"]
                self.state = replicate(self.mesh, restored)
            else:
                self.state = load_checkpoint(self.best_path, self.state)["state"]
        return self.state
