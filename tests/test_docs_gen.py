"""Doc-generation smoke test — tools/gen_api_docs.py (the rebuild's analogue
of the reference's Doxygen target, CMakeLists.txt:21-26)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gen_api_docs_runs_and_covers_public_api(tmp_path):
    out = tmp_path / "api_reference.md"
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_api_docs.py"),
         "-o", str(out)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    text = out.read_text()
    # every top-level export must appear
    for sym in ("cg_solve", "CSRMatrix", "sstep_cg_solve", "block_cg_solve",
                "refined_cg_solve", "accuracy", "CG"):
        assert f"`{sym}" in text, sym
    # section coverage: solver extensions, kernels, sharding, I/O
    for heading in ("s-step CG", "Pipelined CG", "Multi-chip sharding",
                    "SpMV kernels", "MatrixMarket"):
        assert heading in text, heading
    assert text.count("###") > 100  # symbol-level entries, not a stub


def test_committed_reference_is_current_enough():
    """The committed docs/api_reference.md must mention the same top-level
    exports (regeneration reminder, not byte-equality — docstrings move)."""
    path = os.path.join(REPO, "docs", "api_reference.md")
    assert os.path.exists(path)
    text = open(path).read()
    import conjugategradient_tpu as cgt

    for sym in cgt.__all__:
        if sym == "__version__":
            continue
        assert f"`{sym}" in text, (
            f"{sym} missing from docs/api_reference.md — regenerate with "
            "python tools/gen_api_docs.py"
        )


def test_committed_reference_matches_regeneration(tmp_path):
    """Byte-level drift guard (VERDICT r3 #7): the committed generated doc
    must equal what tools/gen_api_docs.py emits from the current source —
    any docstring change without a regeneration fails here, and there is
    exactly ONE generated reference (api_generated.md was a stale orphan)."""
    assert not os.path.exists(os.path.join(REPO, "docs", "api_generated.md"))
    out = tmp_path / "api_reference.md"
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_api_docs.py"),
         "-o", str(out)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    committed = open(os.path.join(REPO, "docs", "api_reference.md")).read()
    assert out.read_text() == committed, (
        "docs/api_reference.md is stale — regenerate with "
        "python tools/gen_api_docs.py -o docs/api_reference.md"
    )
