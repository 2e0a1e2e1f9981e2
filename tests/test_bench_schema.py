"""The headline bench artifact's schema — BENCH_r{N}.json is a judged
record; the one JSON line must keep its contract across refactors.

Runs the real bench_cg at toy size on the CPU backend (portable loop;
the GB/s numbers are meaningless here — only the record's structure and
the byte-accounting invariants are asserted)."""

import json

import pytest


@pytest.fixture(scope="module")
def cg_out():
    import bench

    return bench.bench_cg(n=2048, iters=4)


def test_headline_record_shape(cg_out):
    assert cg_out["metric"] == "cg_iteration_effective_bandwidth"
    assert cg_out["unit"] == "GB/s"
    assert cg_out["value"] > 0
    assert 0 < cg_out["vs_baseline"]
    json.dumps(cg_out)  # must be a valid one-line JSON payload


def test_sym_storage_byte_accounting(cg_out):
    d = cg_out["detail"]
    assert d["storage"] == "sym"
    # effective (full-layout useful) bytes must EXCEED the streamed bytes
    # — that gap is the symmetric layout's whole point — and both views
    # must be present so they can never be confused
    assert d["bytes_per_iter"] > d["bytes_streamed"]
    assert d["stored_gbps"] < cg_out["value"]
    assert d["reps"] >= 3
    assert len(d["reps_gbps"]) == d["reps"]


def test_full_storage_config_keeps_round2_model():
    import bench

    out = bench.bench_cg(n=2048, iters=4, storage="full")
    d = out["detail"]
    assert d["storage"] == "full"
    assert "bytes_streamed" not in d
    assert d["bytes_model"] in (
        "analytic", "xla_cost_analysis", "min(analytic, xla)"
    )
