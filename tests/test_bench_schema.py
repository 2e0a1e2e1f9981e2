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


def test_headline_carries_all_three_numbers():
    """VERDICT r3 weak #2: the driver's one-line record must report the
    symmetric effective value AND the full-storage-comparable number AND
    the machine-honest streamed rate, so r1→rN stay one series."""
    import bench

    out = bench.bench_cg_headline(n=2048, iters=4)
    assert out["metric"] == "cg_iteration_effective_bandwidth"
    assert out["value"] > 0
    assert out["stored_gbps"] > 0
    assert out["full_storage_gbps"] > 0
    assert 0 < out["full_vs_baseline"]
    # effective > machine-honest streamed: the symmetric layout's gap
    assert out["stored_gbps"] < out["value"]
    assert out["detail"]["storage"] == "sym"
    assert out["detail"]["full"]["storage"] == "full"
    json.dumps(out)


def _run_main(monkeypatch, capsys, argv):
    import bench

    rc = bench.main(argv)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(line)


def test_main_probe_failure_prints_parseable_json(monkeypatch, capsys):
    """VERDICT r3 weak #1: a backend-init failure must yield ONE parseable
    JSON line (rc=0), never a traceback."""
    import bench

    def boom(*a, **k):
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(bench, "_probe_device", boom)
    rc, rec = _run_main(monkeypatch, capsys, ["--config", "cg"])
    assert rc == 0
    assert rec["value"] == -1.0
    assert rec["vs_baseline"] == 0.0
    assert rec["stage"] == "probe"
    assert rec["config"] == "cg"
    assert "axon" in rec["error"]


def test_main_bench_failure_prints_parseable_json(monkeypatch, capsys):
    import bench

    monkeypatch.setattr(
        bench, "_probe_device", lambda *a, **k: {"device": "cpu"}
    )
    monkeypatch.setitem(
        bench._CONFIGS, "cg",
        lambda: (_ for _ in ()).throw(ValueError("mid-bench failure")),
    )
    rc, rec = _run_main(monkeypatch, capsys, ["--config", "cg"])
    assert rc == 0
    assert rec["stage"] == "bench"
    assert "mid-bench failure" in rec["error"]


def test_main_success_carries_probe(monkeypatch, capsys):
    import bench

    monkeypatch.setitem(
        bench._CONFIGS, "cg", lambda: bench.bench_cg_headline(n=2048, iters=4)
    )
    rc, rec = _run_main(monkeypatch, capsys, ["--config", "cg"])
    assert rc == 0
    assert "error" not in rec
    assert rec["detail"]["probe"]["device"]
    assert rec["full_storage_gbps"] > 0


def test_probe_retries_once(monkeypatch):
    import bench

    calls = []

    # first attempt raises, second succeeds — patch at the jax level
    import jax

    orig_devices = jax.devices

    def flaky_devices(*a, **k):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("transient relay hiccup")
        return orig_devices(*a, **k)

    monkeypatch.setattr(jax, "devices", flaky_devices)
    probe = bench._probe_device(retries=1, wait_s=0.0)
    assert probe["attempt"] == 1
    assert len(calls) == 2


def test_mgpcg_record_schema():
    """--config mgpcg must emit the A/B contract: speedup value plus both
    sides' time/iterations/convergence in detail (toy grid; the speedup
    magnitude is only meaningful on the chip)."""
    import bench

    out = bench.bench_mgpcg(nx=16, rel=1e-5, plain_maxiter=500, reps=1)
    assert out["metric"] == "mgpcg_solve_speedup"
    assert out["unit"] == "x"
    assert out["value"] > 0
    for side in ("plain", "mgpcg", "mgpcg_chebyshev"):
        d = out["detail"][side]
        assert d["converged"] is True
        assert d["iterations"] > 0 and d["time_s"] > 0
        assert d["true_rel_residual"] < 1e-3
    assert out["detail"]["smoother"] in ("jacobi", "chebyshev")
    assert out["detail"]["mgpcg"]["iterations"] < out["detail"]["plain"]["iterations"]
    json.dumps(out)  # the driver parses one JSON line


def test_cg_bf16_record_schema():
    """--config cg-bf16: bf16 tiles, f32 vectors; `value` stays on the
    full-f32-equivalent byte convention and the metric name carries the
    storage dtype so the longitudinal f32 series is never polluted."""
    import bench

    for storage in ("full", "sym"):
        out = bench.bench_cg(n=2048, iters=4, storage=storage,
                             dtype="bfloat16")
        assert out["metric"] == "cg_iteration_effective_bandwidth_bfloat16"
        d = out["detail"]
        assert d["dtype"] == "bfloat16"
        assert d["storage"] == storage
        # f32-equivalent effective bytes must exceed the physically
        # streamed bf16 bytes regardless of storage
        streamed = d.get("bytes_streamed",
                         d["bytes_models_all"]["analytic"])
        assert d["bytes_per_iter"] > streamed
        json.dumps(out)


def test_amg_record_schema():
    import bench

    out = bench.bench_amg(nx=32, rel=1e-5, plain_maxiter=500, reps=1)
    assert out["metric"] == "amg_solve_speedup"
    d = out["detail"]
    for side in ("plain", "jacobi", "amg", "amg_chebyshev"):
        assert d[side]["converged"] is True
        assert d[side]["time_s"] > 0
    assert d["smoother"] in ("jacobi", "chebyshev")
    assert d["amg"]["iterations"] < d["plain"]["iterations"]
    assert d["amg_levels"][0] == d["n"]
    json.dumps(out)
