"""2-process CPU dryrun of the multi-process (multi-host) execution path.

The reference has no distributed story (single hardcoded ``cuda:1``;
``/root/reference/resnet50-3d-video/main.py:86-88`` is commented-out
DataParallel). The TPU-native scale-out path past one host is
multi-controller SPMD: one process per host, ``jax.distributed.initialize``
joining them, one global mesh whose collectives ride ICI within a slice and
DCN across hosts, and a process-aware data feed where each host decodes only
its shard of every batch (``ClipLoader(process_index=, process_count=)`` ->
``jax.make_array_from_process_local_data``).

This script proves that path end-to-end without multi-host hardware:

  (a) single process, 8 virtual CPU devices, dp=8 data-parallel training
  (b) 2 processes x 4 virtual CPU devices each, the SAME global dp=8 mesh,
      gloo cross-process collectives, process-sharded ClipLoader feed

and asserts the two runs produce the same training history (loss/acc/AUROC
per epoch) and final test metrics. Identity is expected because (b) compiles
the identical SPMD program over the identical global mesh — only the
controller layout differs.

Usage:
  python scripts/dryrun_multiprocess.py              # launcher, prints verdict
  python scripts/dryrun_multiprocess.py --rank 0 ... # internal worker mode
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))  # runnable as `python scripts/dryrun_multiprocess.py`

EPOCHS = 2
GLOBAL_BATCH = 8
COMPARE_KEYS = ("train_loss", "val_loss", "train_acc", "val_acc",
                "train_auroc", "val_auroc")


def worker(rank: int, nprocs: int, port: int, data_dir: str, exp_dir: str,
           out_path: str) -> None:
    """One training controller. rank < 0 means plain single-process mode."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    if rank >= 0:
        from laryngeal_tpu.parallel.distributed import initialize

        initialize(coordinator=f"localhost:{port}", num_processes=nprocs,
                   process_id=rank)
        assert jax.process_count() == nprocs, jax.process_count()

    from laryngeal_tpu.data.pipeline import create_dataloaders
    from laryngeal_tpu.evals.evaluator import Evaluator
    from laryngeal_tpu.models.registry import get_model_spec
    from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
    from laryngeal_tpu.parallel.mesh import make_mesh
    from laryngeal_tpu.train.trainer import Trainer

    assert jax.device_count() == 8, jax.device_count()
    mesh = make_mesh(n_data=8)

    loaders = create_dataloaders(
        data_dir,
        sampling_methods={"train": "random_window", "val": "uniform",
                          "test": "uniform"},
        num_frames=4,
        batch_size=GLOBAL_BATCH,
        resize_to=(64, 64),
        pad_last=True,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    model = VivitForVideoClassification(VivitConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        image_size=64, num_frames=4, num_classes=2))
    spec = get_model_spec("vivit")
    config = {"epochs": EPOCHS, "learning_rate": 1e-3, "crop_size": 64,
              "patience": 5, "seed": 42, "batch_size": GLOBAL_BATCH}
    trainer = Trainer(model, spec, loaders, config, exp_dir=exp_dir, mesh=mesh)
    state = trainer.train()

    ev = Evaluator(trainer.eval_step, loaders["test"],
                   class_names=loaders["test"].dataset.class_labels,
                   exp_dir=None, mesh=mesh)
    auroc, f1, cm = ev.evaluate(state, sampling_method="uniform")

    result = {
        "rank": rank,
        "process_count": jax.process_count(),
        "history": {k: trainer.history[k] for k in COMPARE_KEYS},
        "auroc": float(auroc),
        "f1": float(f1),
        "cm": [[int(x) for x in row] for row in cm],
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[worker rank={rank}] done -> {out_path}", flush=True)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(rank, nprocs, port, data_dir, exp_dir, out_path, n_local_devices):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return subprocess.Popen(
        [sys.executable, str(Path(__file__).resolve()),
         "--rank", str(rank), "--nprocs", str(nprocs), "--port", str(port),
         "--data", data_dir, "--exp", exp_dir, "--out", out_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def launch(tmp: str, timeout: int = 900) -> dict:
    """Run (a) and (b); return {'single': ..., 'multi': ..., 'match': bool}."""
    from laryngeal_tpu.data.synthetic import make_synthetic_dataset

    data_dir = str(Path(tmp) / "data")
    make_synthetic_dataset(data_dir, {"train": 4, "val": 2, "test": 2},
                           num_frames=12, h=64, w=64, seed=5)

    def run_procs(procs, names):
        outs = []
        for p, name in zip(procs, names):
            out, _ = p.communicate(timeout=timeout)
            if p.returncode != 0:
                raise RuntimeError(f"{name} failed (rc={p.returncode}):\n{out[-4000:]}")
            outs.append(out)
        return outs

    # (a) single process, 8 devices.
    out_single = str(Path(tmp) / "single.json")
    p = _spawn(-1, 1, 0, data_dir, str(Path(tmp) / "exp_single"), out_single, 8)
    run_procs([p], ["single-process run"])

    # (b) 2 processes x 4 devices, one global mesh. Both share one exp dir
    # (process 0 writes checkpoints; process 1 reads them — shared fs).
    port = _free_port()
    out0 = str(Path(tmp) / "mp_rank0.json")
    out1 = str(Path(tmp) / "mp_rank1.json")
    exp_mp = str(Path(tmp) / "exp_mp")
    procs = [_spawn(0, 2, port, data_dir, exp_mp, out0, 4),
             _spawn(1, 2, port, data_dir, exp_mp, out1, 4)]
    run_procs(procs, ["mp rank 0", "mp rank 1"])

    single = json.loads(Path(out_single).read_text())
    mp0 = json.loads(Path(out0).read_text())
    mp1 = json.loads(Path(out1).read_text())

    def diff(a, b):
        worst = 0.0
        for k in COMPARE_KEYS:
            for x, y in zip(a["history"][k], b["history"][k]):
                worst = max(worst, abs(x - y))
        worst = max(worst, abs(a["auroc"] - b["auroc"]),
                    abs(a["f1"] - b["f1"]))
        return worst

    # Both ranks of (b) must agree exactly (same replicated values fetched).
    rank_diff = diff(mp0, mp1)
    # (b) vs (a): identical SPMD program on the identical global mesh.
    sp_diff = diff(single, mp0)
    return {
        "single": single, "multi": mp0,
        "rank_disagreement": rank_diff,
        "single_vs_multi": sp_diff,
        "cm_match": single["cm"] == mp0["cm"] == mp1["cm"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--data", type=str, default=None)
    ap.add_argument("--exp", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    if args.rank is not None:
        worker(args.rank, args.nprocs, args.port, args.data, args.exp, args.out)
        return

    with tempfile.TemporaryDirectory() as tmp:
        res = launch(tmp)
        verdict = {
            "rank_disagreement": res["rank_disagreement"],
            "single_vs_multi": res["single_vs_multi"],
            "cm_match": res["cm_match"],
            "single_history_val_loss": res["single"]["history"]["val_loss"],
            "multi_history_val_loss": res["multi"]["history"]["val_loss"],
        }
        print(json.dumps(verdict, indent=2))
        ok = (res["rank_disagreement"] == 0.0
              and res["single_vs_multi"] <= 1e-6 and res["cm_match"])
        print("PASS" if ok else "FAIL")
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
