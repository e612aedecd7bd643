"""Unit tests for bench.py's certify-capture machinery (VERDICT r4 #1/#2):
the plausibility gate (re-measure-once + artifact marking) and the verify
check retry/diagnostics. These paths only trigger on relay mishaps in real
runs, so they are unit-tested here with synthetic sections."""

import sys

sys.path.insert(0, ".")

import bench  # noqa: E402


def test_gate_passes_in_band_rows_through():
    calls = []

    def fn():
        calls.append(1)
        return {"admm_flagship_us_per_batch": (50.0, "us")}

    artifacts = {}
    rows = bench._gated_section("x", fn, artifacts)
    assert len(calls) == 1            # no re-measure
    assert artifacts == {}
    assert rows["admm_flagship_us_per_batch"][0] == 50.0


def test_gate_remeasures_once_and_accepts_recovery():
    """First measurement impossible (16 us < the 42.9 us SoL — the actual
    r4 driver artifact), second in-band: the gate re-runs the WHOLE
    section once and keeps the recovered value unflagged."""
    vals = iter([16.2, 49.5])

    def fn():
        return {"admm_flagship_us_per_batch": (next(vals), "us")}

    artifacts = {}
    rows = bench._gated_section("x", fn, artifacts)
    assert rows["admm_flagship_us_per_batch"][0] == 49.5
    assert artifacts == {}


def test_gate_marks_persistent_artifact_with_band():
    def fn():
        return {"admm_flagship_us_per_batch": (16.2, "us"),
                "latency_256batch_us": (3.0, "us")}

    artifacts = {}
    rows = bench._gated_section("x", fn, artifacts)
    assert "admm_flagship_us_per_batch" in artifacts
    lo, hi = artifacts["admm_flagship_us_per_batch"]
    assert lo <= 400.0 <= hi or (lo, hi) == (40.0, 400.0)
    assert "latency_256batch_us" not in artifacts   # in-band row untouched
    assert rows["admm_flagship_us_per_batch"][0] == 16.2  # value preserved


def test_gate_disabled_never_remeasures():
    calls = []

    def fn():
        calls.append(1)
        return {"admm_flagship_us_per_batch": (16.2, "us")}

    artifacts = {}
    bench._gated_section("x", fn, artifacts, enabled=False)
    assert len(calls) == 1 and artifacts == {}


def test_unknown_rows_are_not_gated():
    def fn():
        return {"some_new_row": (1e12, "widgets/s")}

    artifacts = {}
    rows = bench._gated_section("x", fn, artifacts)
    assert artifacts == {} and rows["some_new_row"][0] == 1e12


def test_bands_cover_all_emitted_certify_rows():
    """Every row the TPU certify emits (CERTIFY.json keys) must have a
    plausibility band — a new unbanded row would silently skip the gate."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CERTIFY.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("no CERTIFY.json checked out")
    rows = json.load(open(path)).get("rows", {})
    missing = [k for k in rows
               if k not in bench.PLAUSIBILITY_BANDS
               and not k.endswith(("_failed", "_skipped_budget"))]
    assert not missing, f"certify rows without plausibility bands: {missing}"
