"""Five-family AOT export size/drift table (round-3 VERDICT #3).

Exports every family at FULL model width (ViViT-B, TimeSformer-B, Swin3D-T,
slow-R50-3D, R50-LSTM; 8 frames x 224^2 so the CPU drift forwards stay
tractable — artifact size is dominated by the baked weights, which are
frame-count independent) for f32 / bf16 / int8 weights, records artifact
bytes, and measures the probability drift of each reduced-precision
artifact against its own f32 artifact on the same random clips.

Correctness of the round-trip itself (vs the LIVE predictor, all families,
incl. video-path serving) is pinned in tests/test_export_families.py; this
script produces the BASELINE.md size/drift table.

Run:  JAX_PLATFORM_NAME=cpu python scripts/export_size_drift_table.py
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

T, HW, NB = 8, 224, 2  # frames, crop, drift-probe batch


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from laryngeal_tpu.infer.export import (ExportedModel, export_predictor,
                                            save_exported)
    from laryngeal_tpu.infer.predictor import Predictor
    from laryngeal_tpu.models.registry import create_model, get_model_spec
    from laryngeal_tpu.train.state import create_train_state

    rng = np.random.default_rng(11)
    clips = rng.integers(0, 256, (NB, T, HW, HW, 3), dtype=np.uint8)
    out_dir = Path("/tmp/export_table")
    out_dir.mkdir(exist_ok=True)

    rows = {}
    for family in ("vivit", "timesformer", "swin3d", "resnet3d",
                   "resnet50_lstm"):
        spec = get_model_spec(family)
        kw = ({"num_frames": T} if family in ("vivit", "timesformer")
              else {})  # the CNN/swin families are frame-count agnostic
        model = create_model(family, **kw)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            jnp.zeros((1, T, HW, HW, 3), jnp.float32),
            optimizer=spec.optimizer, learning_rate=1e-3, weight_decay=0.01)
        pred = Predictor(model, spec, state, num_frames=T, crop_size=HW)
        n_params = sum(x.size for x in jax.tree.leaves(state.params))

        row = {"params_m": round(n_params / 1e6, 1)}
        ref_probs = None
        for arm, kw in (("f32", {}),
                        ("bf16", {"weights_dtype": "bf16"}),
                        ("int8", {"quantize": "int8"})):
            art = export_predictor(pred, batch_sizes=(NB,), **kw)
            path = save_exported(art, out_dir / f"{family}_{arm}.lxa")
            probs = np.asarray(ExportedModel.load(path).predict(clips))
            if arm == "f32":
                ref_probs = probs
            row[f"{arm}_mb"] = round(path.stat().st_size / 1e6, 1)
            row[f"{arm}_max_drift"] = round(
                float(np.abs(probs - ref_probs).max()), 5)
        row["int8_vs_f32_size"] = round(row["int8_mb"] / row["f32_mb"], 3)
        rows[family] = row
        print(json.dumps({family: row}), flush=True)

    print("\n| family | params | f32 MB | bf16 MB (drift) | int8 MB (drift) "
          "| int8/f32 |")
    print("|---|---|---|---|---|---|")
    for fam, r in rows.items():
        print(f"| {fam} | {r['params_m']}M | {r['f32_mb']} "
              f"| {r['bf16_mb']} ({r['bf16_max_drift']}) "
              f"| {r['int8_mb']} ({r['int8_max_drift']}) "
              f"| {r['int8_vs_f32_size']} |")


if __name__ == "__main__":
    main()
