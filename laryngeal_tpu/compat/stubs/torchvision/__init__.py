"""torchvision STUB — import-surface shim for running the reference
pipelines in environments without torchvision (absent from this image).

Provides only what the reference datasets/models import:
``torchvision.transforms`` {Compose, RandomCrop, RandomHorizontalFlip,
CenterCrop} with torchvision's tensor semantics on (..., H, W) — the CNN
datasets apply them to (C, T, H, W) video tensors
(``resnet50-3d-video/.../dataset.py:174-192``).

Used by ``scripts/reference_ab.py`` (prepended to the reference
subprocess's PYTHONPATH). NOT installed or imported by laryngeal_tpu
itself; the in-tree parity tests keep their own ``pytest.importorskip``
guards untouched.
"""

from . import transforms  # noqa: F401
