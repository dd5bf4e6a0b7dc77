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
