#!/usr/bin/env python
"""Download SuiteSparse SPD test matrices (the problems the reference's
harness consumes, test/Tester.cpp:14-21).

This build environment has no network egress, so the benchmark/parity suites
use deterministic generated stand-ins (tools/make_problem.py); on a machine
with network access this script fetches the real matrices:

  python tools/fetch_suitesparse.py 1138_bus bcsstk17 G3_circuit Flan_1565 -o problems/
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tarfile
import urllib.request

# SuiteSparse collection groups for the matrices BASELINE.json names.
GROUPS = {
    "1138_bus": "HB",
    "bcsstk17": "HB",
    "G3_circuit": "AMD",
    "Flan_1565": "Janna",
    "bcsstk14": "HB",
    "nos7": "HB",
}

URL = "https://suitesparse-collection-website.herokuapp.com/MM/{group}/{name}.tar.gz"


def fetch(name: str, outdir: str) -> str:
    group = GROUPS.get(name)
    if group is None:
        raise SystemExit(
            f"unknown matrix {name!r}; add its group to GROUPS "
            f"(look it up at sparse.tamu.edu)"
        )
    url = URL.format(group=group, name=name)
    print(f"fetching {url} ...")
    with urllib.request.urlopen(url, timeout=120) as resp:
        payload = resp.read()
    with tarfile.open(fileobj=io.BytesIO(payload), mode="r:gz") as tf:
        member = f"{name}/{name}.mtx"
        tf.extract(member, path=outdir)
    path = os.path.join(outdir, member)
    print(f"wrote {path}")
    return path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("names", nargs="+", help="SuiteSparse matrix names")
    ap.add_argument("-o", "--outdir", default="problems")
    args = ap.parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.names:
        try:
            fetch(name, args.outdir)
        except Exception as e:  # zero-egress environments land here
            print(f"FAILED {name}: {e}", file=sys.stderr)
            print(
                "no network? generate a stand-in instead: "
                f"python tools/make_problem.py banded --n 4000 -o {args.outdir}/{name}.mtx",
                file=sys.stderr,
            )
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
