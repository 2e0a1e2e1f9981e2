"""tools/fetch_suitesparse.py integrity pins (round-5 hardening): header
metadata validation + sha256 trust-on-first-use, exercised offline on
synthetic files."""

import importlib.util
import os
import pathlib
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
spec = importlib.util.spec_from_file_location(
    "fetch_suitesparse", ROOT / "tools" / "fetch_suitesparse.py")
fsp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fsp)


def _write_mtx(path, n, entries):
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("% synthetic test file\n")
        f.write(f"{n} {n} {len(entries)}\n")
        for i, j, v in entries:
            f.write(f"{i} {j} {v}\n")


@pytest.fixture()
def fake_pin(tmp_path, monkeypatch):
    entries = [(1, 1, 2.0), (2, 2, 2.0), (2, 1, -1.0), (3, 3, 2.0)]
    p = tmp_path / "fake.mtx"
    _write_mtx(p, 3, entries)
    monkeypatch.setitem(fsp.META, "fake", ("HB", 3, 4))
    return p


def test_validate_accepts_and_records_digest(fake_pin):
    fsp.validate("fake", str(fake_pin))
    pin = str(fake_pin) + ".sha256"
    assert os.path.exists(pin)
    digest = open(pin).read().split()[0]
    assert len(digest) == 64
    # second pass re-verifies against the pin
    fsp.validate("fake", str(fake_pin))


def test_validate_rejects_wrong_dimension(fake_pin, monkeypatch):
    monkeypatch.setitem(fsp.META, "fake", ("HB", 5, 4))
    with pytest.raises(ValueError, match="published is 5x5"):
        fsp.validate("fake", str(fake_pin))


def test_validate_rejects_wrong_nnz(fake_pin, monkeypatch):
    monkeypatch.setitem(fsp.META, "fake", ("HB", 3, 99))
    with pytest.raises(ValueError, match="stored entries"):
        fsp.validate("fake", str(fake_pin))
    # --lax-nnz escape hatch still checks the dimension
    fsp.validate("fake", str(fake_pin), strict_nnz=False)


def test_validate_rejects_tampered_file(fake_pin):
    fsp.validate("fake", str(fake_pin))  # records the pin
    with open(fake_pin, "a") as f:
        f.write("% tampered\n")
    with pytest.raises(ValueError, match="sha256"):
        fsp.validate("fake", str(fake_pin))


def test_stored_entry_pins_are_consistent_with_expanded_published():
    """The stored-entry pins must equal (nnz_full + n)/2 for the expanded
    figures tests/test_suitesparse_real.py pins — one source of truth."""
    full = {"1138_bus": 4054, "bcsstk17": 428650,
            "G3_circuit": 7660826, "Flan_1565": 114165372,
            "bcsstk14": 63454, "nos7": 4617}
    for name, (group, n, stored) in fsp.META.items():
        assert stored == (full[name] + n) // 2, name


def test_refetch_verifies_against_final_pin(fake_pin, tmp_path):
    """Round-5 review fix: the pin lives at the FINAL install location and
    a re-fetch must verify against it (not silently re-pin)."""
    final_pin = str(tmp_path / "fake_final.mtx.sha256")
    fsp.validate("fake", str(fake_pin), pin_path=final_pin)
    assert os.path.exists(final_pin)
    digest0 = open(final_pin).read().split()[0]
    # clean re-validate against the same pin: passes, pin unchanged
    fsp.validate("fake", str(fake_pin), pin_path=final_pin)
    assert open(final_pin).read().split()[0] == digest0
    # tampered content with the SAME header counts must be rejected
    lines = open(fake_pin).read().splitlines()
    lines[-1] = "3 3 9.5"  # change a value, not the counts
    with open(fake_pin, "w") as f:
        f.write("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="sha256"):
        fsp.validate("fake", str(fake_pin), pin_path=final_pin)
