"""Import-surface only: the reference resnet3d dataset imports ClipInfo and
make_clip_sampler (``resnet50-3d-video/.../data_config/dataset.py:4-5``) but
never calls them — its __getitem__ computes start/end seconds itself."""

from collections import namedtuple

ClipInfo = namedtuple(
    "ClipInfo", ["clip_start_sec", "clip_end_sec", "clip_index",
                 "aug_index", "is_last_clip"])


def make_clip_sampler(*args, **kwargs):
    raise NotImplementedError(
        "pytorchvideo stub: clip samplers are not implemented (the "
        "reference imports but never uses them)")
