"""Parameterized wire specs in bench.py (`dctp@q75k23p8`).

The interleaved wire A/B (BENCH_WIRE_AB_ARMS) compares arms inside ONE
relay session; parameterized specs extend it from wire *kinds* to wire
*parameters* (quality / keep_ac / pack_from) without touching the
process-global BENCH_DCT_* env knobs.
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import bench  # noqa: E402


def test_plain_names_use_env_defaults():
    for name in ("raw", "delta", "dct", "dctp"):
        kind, q, k, p = bench.wire_params(name)
        assert kind == name
        assert (q, k, p) == (bench.DCT_QUALITY, bench.DCT_KEEP,
                             bench.DCT_PACK_FROM)


def test_parameterized_specs_parse():
    assert bench.wire_params("dctp@q75k23p8") == ("dctp", 75, 23, 8)
    assert bench.wire_params("dct@q60k31") == ("dct", 60, 31,
                                               bench.DCT_PACK_FROM)


@pytest.mark.parametrize("bad", ["dctp@", "dctp@k23", "raw@q75k31",
                                 "dctp@q75k23p8x"])
def test_bad_specs_raise(bad):
    with pytest.raises(ValueError):
        bench.wire_params(bad)


def test_lowres_suffix_parses():
    # l<n> rides after the dct params and does not disturb them.
    assert bench.wire_params("dctp@q75k15p8l1") == ("dctp", 75, 15, 8)
    assert bench.wire_lowres("dctp@q75k15p8l1") == 1
    assert bench.wire_lowres("dctp@q75k15p8") == bench.LOWRES
    # Regression: None must fall back to the session default WIRE, not
    # crash ("@" in None) — bench_transfer calls wire_lowres(None).
    assert bench.wire_lowres(None) == bench.wire_lowres(bench.WIRE)
    assert bench._wire_hw("dctp@q75k15p8l1") == bench.CROP >> 1


def test_planes_per_block_tracks_spec():
    # dct: DC int16 (2 byte-planes) + keep AC byte-planes
    assert bench._dct_planes_per_block("dct@q75k31") == 33
    assert bench._dct_planes_per_block("dct@q75k23") == 25
    # dctp: planes >= pack_from are nibble-packed pairwise
    assert bench._dct_planes_per_block("dctp@q75k31p14") == 2 + 14 + 9
    assert bench._dct_planes_per_block("dctp@q75k23p8") == 2 + 8 + 8
    # pack_from beyond keep degenerates to the unpacked dct payload
    assert (bench._dct_planes_per_block("dctp@q75k23p99")
            == bench._dct_planes_per_block("dct@q75k23"))


def test_prebuild_native_and_canary():
    """Round-5 scoreboard hardening: the native build/load happens OUTSIDE
    timed sections (prebuild_native) and the host-weather telemetry carries
    a fixed-work CPU-speed canary (guest-invisible vCPU sharing)."""
    t = bench.prebuild_native()
    assert isinstance(t, float) and t >= 0.0
    from laryngeal_tpu.data import native
    # After prebuild the loader state is settled either way; on this image
    # the toolchain exists so the library must be available.
    assert native.available()
    rate = bench.cpu_canary_mb_s(mb=8)  # tiny fixed work for a unit test
    assert rate > 0


def test_decode_probe_returns_wall_and_cpu_rates(tmp_path):
    import numpy as np

    from laryngeal_tpu.data.synthetic import synth_video
    from laryngeal_tpu.data.video import write_video

    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"v{i}.mp4"
        write_video(p, synth_video(rng, 96, 64, 64, referral=bool(i % 2)),
                    fps=30)
        paths.append(p)
    wall, cpu = bench.bench_decode_only(paths, wire="raw")
    assert wall > 0 and cpu > 0
    # thread_time excludes wall stalls, so the CPU-basis rate can only be
    # >= the wall rate up to timer noise.
    assert cpu >= wall * 0.8
