"""wandb STUB — telemetry no-op for running the reference 2d-lstm pipeline
offline (its trainer imports wandb at module level,
``resnet50-2d-lstm/src/trainer/trainer.py:5,133-138``; wandb is absent from
this image). Only the five call sites the reference uses are provided.
Experiment tracking is telemetry, not math, so the A/B is unaffected — but
the reference's per-epoch ``wandb.log`` stream (trainer.py:264-275) is the
cleanest machine-readable record of its training loop (incl. the
ReduceLROnPlateau learning_rate trajectory), so when
``LARYNGEAL_STUB_WANDB_JSONL`` names a file every ``log()`` payload is
appended there as one JSON line for the whole-train-loop A/B
(scripts/reference_ab.py) to diff. NOT used by laryngeal_tpu itself (its
own tracking layer is ``laryngeal_tpu/utils/tracking.py``)."""

import json
import os

run = None


class _Run:
    def __init__(self, **kwargs):
        self.config = kwargs.get("config", {})

    def finish(self):
        global run
        run = None


def init(**kwargs):
    global run
    run = _Run(**kwargs)
    return run


def log(*args, **kwargs):
    path = os.environ.get("LARYNGEAL_STUB_WANDB_JSONL")
    if path and args and isinstance(args[0], dict):
        with open(path, "a") as f:
            f.write(json.dumps(args[0], default=float) + "\n")


def finish():
    global run
    run = None
