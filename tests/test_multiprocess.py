"""Multi-process (multi-host) execution path (VERDICT r4 #1).

Three layers:
- pure host-side: the process-sharded ClipLoader emits shards that
  reassemble into exactly the single-process batch;
- mesh math: local_batch_slice / global_batch_rows on the test mesh;
- end-to-end: the 2-process CPU dryrun (gloo collectives, real
  jax.distributed.initialize, subprocess-spawned) trains the identical
  model to the single-process result. The reference has no distributed
  counterpart (SURVEY.md §2.4 — commented-out DataParallel,
  resnet50-3d-video/main.py:86-88).
"""

import json
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest
import jax

from laryngeal_tpu.data.pipeline import ClipLoader, create_dataloaders
from laryngeal_tpu.data.synthetic import make_synthetic_dataset

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp_synth")
    make_synthetic_dataset(
        str(root), {"train": 3, "val": 2, "test": 2}, num_frames=10,
        h=48, w=48, seed=11)
    return root


def _batches(root, rank, count, **kw):
    loaders = create_dataloaders(
        str(root), num_frames=4, batch_size=4, resize_to=(48, 48),
        pad_last=True, process_index=rank, process_count=count, **kw)
    return {split: list(loaders[split]) for split in ("train", "val", "test")}


def test_process_shards_reassemble_to_single_process_batch(synth_root):
    """rank0+rank1 shards concatenated == the single-process batch, for every
    batch of every split (including the padded final batch)."""
    full = _batches(synth_root, 0, 1)
    r0 = _batches(synth_root, 0, 2)
    r1 = _batches(synth_root, 1, 2)
    for split in ("train", "val", "test"):
        assert len(full[split]) == len(r0[split]) == len(r1[split])
        for bf, b0, b1 in zip(full[split], r0[split], r1[split]):
            np.testing.assert_array_equal(
                bf["pixel_values"],
                np.concatenate([b0["pixel_values"], b1["pixel_values"]]))
            np.testing.assert_array_equal(
                bf["labels"], np.concatenate([b0["labels"], b1["labels"]]))
            np.testing.assert_array_equal(
                bf["mask"], np.concatenate([b0["mask"], b1["mask"]]))
            # Global views agree with the single-process batch.
            np.testing.assert_array_equal(bf["labels"], b0["labels_global"])
            np.testing.assert_array_equal(bf["mask"], b1["mask_global"])
            assert b0["local_rows"] == (0, 2) and b1["local_rows"] == (2, 4)


def test_process_shard_wire_payload_tuple(synth_root):
    """Wire-format (tuple) payloads shard leaf-wise per process."""
    full = _batches(synth_root, 0, 1, wire="dctp", wire_lowres=0)
    r0 = _batches(synth_root, 0, 2, wire="dctp", wire_lowres=0)
    r1 = _batches(synth_root, 1, 2, wire="dctp", wire_lowres=0)
    bf, b0, b1 = full["val"][0], r0["val"][0], r1["val"][0]
    assert isinstance(bf["pixel_values"], tuple)
    for k in range(len(bf["pixel_values"])):
        np.testing.assert_array_equal(
            bf["pixel_values"][k],
            np.concatenate([b0["pixel_values"][k], b1["pixel_values"][k]]))


def test_process_count_validation(synth_root):
    from laryngeal_tpu.data.dataset import VideoDataset

    ds = VideoDataset(str(synth_root), mode="val", num_frames=4,
                      resize_to=(48, 48))
    with pytest.raises(ValueError, match="divide evenly"):
        ClipLoader(ds, batch_size=5, process_count=2, pad_last=True)
    with pytest.raises(ValueError, match="pad_last or drop_last"):
        ClipLoader(ds, batch_size=4, process_count=2)


def test_local_batch_slice_single_process():
    from laryngeal_tpu.parallel.distributed import (global_batch_rows,
                                                    local_batch_slice)
    from laryngeal_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=8)
    assert local_batch_slice(mesh, 16) == (0, 16)
    assert global_batch_rows(mesh, 16) == 16


def test_two_process_dryrun_matches_single_process():
    """The real thing: spawn the 2-process gloo run + the single-process
    control and compare training histories. Slow (~4-8 min on CPU)."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import dryrun_multiprocess as dmp
    finally:
        sys.path.pop(0)
    with tempfile.TemporaryDirectory() as tmp:
        res = dmp.launch(tmp, timeout=900)
    # Ranks see identical replicated values — exact agreement.
    assert res["rank_disagreement"] == 0.0
    # vs single process: identical SPMD program, different all-reduce
    # transport (gloo ring vs in-process) — float reassociation only.
    assert res["single_vs_multi"] <= 1e-5, res["single_vs_multi"]
    assert res["cm_match"]
