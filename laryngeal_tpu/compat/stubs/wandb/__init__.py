"""wandb STUB — telemetry no-op for running the reference 2d-lstm pipeline
offline (its trainer imports wandb at module level,
``resnet50-2d-lstm/src/trainer/trainer.py:5,133-138``; wandb is absent from
this image). Only the five call sites the reference uses are provided;
nothing is recorded — experiment tracking is telemetry, not math, so the
A/B is unaffected. NOT used by laryngeal_tpu itself (its own tracking layer
is ``laryngeal_tpu/utils/tracking.py``)."""

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
    pass


def finish():
    global run
    run = None
