#!/usr/bin/env python
"""Download SuiteSparse SPD test matrices (the problems the reference's
harness consumes, test/Tester.cpp:14-21).

This build environment has no network egress, so the benchmark/parity suites
use deterministic generated stand-ins (tools/make_problem.py); on a machine
with network access this script fetches the real matrices:

  python tools/fetch_suitesparse.py 1138_bus bcsstk17 G3_circuit Flan_1565 -o problems/

Integrity (round-5 hardening): each matrix's header is validated against
the published collection metadata (dimension + stored-entry count) before
the file is accepted, and the sha256 of the extracted ``.mtx`` is recorded
next to it (``<name>.mtx.sha256``, trust-on-first-use — the collection
publishes no official digests) and re-verified on later fetches.  A file
that passes activates tests/test_suitesparse_real.py and the five-config
table automatically (BASELINE.md).
"""

from __future__ import annotations

import argparse
import hashlib
import io
import os
import sys
import tarfile
import urllib.request

# SuiteSparse collection groups + published header metadata
# (dimension, stored entries) from sparse.tamu.edu for the matrices
# BASELINE.json names.  The stored-entry count is the .mtx coordinate
# line count — for these symmetric matrices (lower triangle stored once)
# it is (nnz_full + n) / 2 with nnz_full the collection's published
# "nonzeros" (1138_bus 4054, bcsstk17 428650, G3_circuit 7660826,
# Flan_1565 114165372, bcsstk14 63454, nos7 4617 — the same figures
# tests/test_suitesparse_real.py pins on the expanded side).
META = {
    "1138_bus": ("HB", 1138, 2596),
    "bcsstk17": ("HB", 10974, 219812),
    "G3_circuit": ("AMD", 1585478, 4623152),
    "Flan_1565": ("Janna", 1564794, 57865083),
    "bcsstk14": ("HB", 1806, 32630),
    "nos7": ("HB", 729, 2673),
}

URL = "https://suitesparse-collection-website.herokuapp.com/MM/{group}/{name}.tar.gz"


def _mtx_header(path: str):
    """(nrows, ncols, stored_entries) from a MatrixMarket coordinate file."""
    with open(path, "r") as f:
        first = f.readline()
        if not first.startswith("%%MatrixMarket"):
            raise ValueError(f"{path}: not a MatrixMarket file")
        for line in f:
            if not line.lstrip().startswith("%") and line.strip():
                parts = line.split()
                return int(parts[0]), int(parts[1]), int(parts[2])
    raise ValueError(f"{path}: no size line")


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def validate(name: str, path: str, strict_nnz: bool = True,
             pin_path: str = None) -> None:
    """Header + digest validation; raises on mismatch.  ``pin_path`` is
    where the sha256 pin lives/is recorded (defaults to ``path`` +
    '.sha256') — fetch() passes the FINAL install location so re-fetches
    verify against the existing pin instead of silently re-pinning."""
    group, n_pub, nnz_pub = META[name]
    nr, nc, nnz = _mtx_header(path)
    if (nr, nc) != (n_pub, n_pub):
        raise ValueError(
            f"{name}: header says {nr}x{nc}, published is {n_pub}x{n_pub} "
            f"— wrong or corrupted file"
        )
    if strict_nnz and nnz != nnz_pub:
        raise ValueError(
            f"{name}: header says {nnz} stored entries, published is "
            f"{nnz_pub} — wrong or corrupted file (pass --lax-nnz if the "
            f"collection metadata was updated upstream)"
        )
    digest = _sha256(path)
    pin = pin_path if pin_path is not None else path + ".sha256"
    if os.path.exists(pin):
        want = open(pin).read().split()[0]
        if want != digest:
            raise ValueError(
                f"{name}: sha256 {digest[:16]}... != pinned "
                f"{want[:16]}... ({pin})"
            )
        print(f"  sha256 OK (pinned): {digest[:16]}...")
    else:
        with open(pin, "w") as f:
            f.write(f"{digest}  {os.path.basename(path)}\n")
        print(f"  sha256 recorded (trust-on-first-use): {digest[:16]}... "
              f"-> {pin}")


def fetch(name: str, outdir: str, strict_nnz: bool = True) -> str:
    meta = META.get(name)
    if meta is None:
        raise SystemExit(
            f"unknown matrix {name!r}; add its group+metadata to META "
            f"(look it up at sparse.tamu.edu)"
        )
    url = URL.format(group=meta[0], name=name)
    print(f"fetching {url} ...")
    with urllib.request.urlopen(url, timeout=120) as resp:
        payload = resp.read()
    with tarfile.open(fileobj=io.BytesIO(payload), mode="r:gz") as tf:
        member = f"{name}/{name}.mtx"
        tf.extract(member, path=outdir)
    path = os.path.join(outdir, member)
    final = os.path.join(outdir, f"{name}.mtx")
    # validate against the pin at the FINAL location, so a re-fetch is
    # checked against (not silently replacing) the recorded digest
    validate(name, path, strict_nnz=strict_nnz,
             pin_path=final + ".sha256")
    os.replace(path, final)
    print(f"wrote {final}")
    return final


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("names", nargs="+", help="SuiteSparse matrix names")
    ap.add_argument("-o", "--outdir", default="problems")
    ap.add_argument("--lax-nnz", action="store_true",
                    help="accept a stored-entry count differing from the "
                         "pinned metadata (upstream metadata churn)")
    args = ap.parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)
    rc = 0
    for name in args.names:
        try:
            fetch(name, args.outdir, strict_nnz=not args.lax_nnz)
        except Exception as e:  # zero-egress environments land here
            print(f"FAILED {name}: {e}", file=sys.stderr)
            print(
                "no network? generate a stand-in instead: "
                f"python tools/make_problem.py banded --n 4000 -o {args.outdir}/{name}.mtx",
                file=sys.stderr,
            )
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
