#!/usr/bin/env python
"""Generate docs/api_generated.md from the package's docstrings.

The reference builds Doxygen HTML from its header comments
(`/root/reference/CMakeLists.txt:21-26`, `doxygen Doxyfile.in`); this is the
rebuild's equivalent doc-generation step: every public symbol's signature
and docstring, extracted from source, with the reference file:line
citations the docstrings carry.  The hand-written `docs/api.md` stays the
curated map; this file is the exhaustive generated reference.

  python tools/gen_api_docs.py            # writes docs/api_generated.md
  python tools/gen_api_docs.py --check    # exit 1 if the file is stale
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# public modules, in presentation order
MODULES = [
    "conjugategradient_tpu",
    "conjugategradient_tpu.types",
    "conjugategradient_tpu.solver.cg",
    "conjugategradient_tpu.solver.batched",
    "conjugategradient_tpu.solver.fused",
    "conjugategradient_tpu.solver.fused_stencil",
    "conjugategradient_tpu.solver.pipelined",
    "conjugategradient_tpu.solver.precond",
    "conjugategradient_tpu.solver.checkpoint",
    "conjugategradient_tpu.parallel.sharded_cg",
    "conjugategradient_tpu.parallel.sharded_stencil",
    "conjugategradient_tpu.ops.spmv",
    "conjugategradient_tpu.ops.blas",
    "conjugategradient_tpu.ops.stencil",
    "conjugategradient_tpu.io.mtx",
    "conjugategradient_tpu.io.loader",
    "conjugategradient_tpu.io.native",
    "conjugategradient_tpu.oracle",
    "conjugategradient_tpu.problems",
    "conjugategradient_tpu.reorder",
    "conjugategradient_tpu.compat",
    "conjugategradient_tpu.scipy_compat",
    "conjugategradient_tpu.utils.benchmarking",
    "conjugategradient_tpu.utils.timing",
    "conjugategradient_tpu.utils.tracing",
    "conjugategradient_tpu.utils.profiling",
    "conjugategradient_tpu.utils.logging",
]


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in sorted(names):
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        # only symbols defined in this package (skip re-imports of jax/np)
        home = getattr(obj, "__module__", mod.__name__) or mod.__name__
        if not home.startswith("conjugategradient_tpu") and mod.__name__ != "conjugategradient_tpu":
            continue
        if inspect.isfunction(obj) or inspect.isclass(obj):
            out.append((n, obj))
    return out


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else "*(no docstring)*"


def render() -> str:
    lines = [
        "# Generated API reference",
        "",
        "<!-- GENERATED FILE - do not edit.  Rebuild with:",
        "       python tools/gen_api_docs.py",
        "     (the doc-generation equivalent of the reference's Doxygen",
        "      target, /root/reference/CMakeLists.txt:21-26) -->",
        "",
        "Curated overview: [api.md](api.md).  Everything below is extracted",
        "from source docstrings, which carry the reference file:line",
        "citations the parity contract requires.",
        "",
    ]
    for modname in MODULES:
        mod = importlib.import_module(modname)
        lines.append(f"## `{modname}`")
        lines.append("")
        mdoc = inspect.getdoc(mod)
        if mdoc:
            lines.append(mdoc.strip().split("\n\n")[0])
            lines.append("")
        for name, obj in _public_members(mod):
            if inspect.isclass(obj):
                lines.append(f"### class `{modname}.{name}`")
                lines.append("")
                lines.append(_doc(obj))
                lines.append("")
                for mname, meth in sorted(vars(obj).items()):
                    if mname.startswith("_"):
                        continue
                    target = meth
                    if isinstance(meth, (staticmethod, classmethod)):
                        target = meth.__func__
                    if isinstance(meth, property):
                        lines.append(f"- **`.{mname}`** (property) — "
                                     f"{(_doc(meth.fget) if meth.fget else '')[:300]}")
                        continue
                    if not inspect.isfunction(target):
                        continue
                    first = _doc(target).split("\n\n")[0]
                    lines.append(
                        f"- **`.{mname}{_signature(target)}`** — {first}"
                    )
                lines.append("")
            else:
                lines.append(f"### `{modname}.{name}{_signature(obj)}`")
                lines.append("")
                lines.append(_doc(obj))
                lines.append("")
    return "\n".join(lines) + "\n"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--check", action="store_true",
                    help="verify docs/api_generated.md is current")
    ap.add_argument("-o", "--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "api_generated.md"))
    args = ap.parse_args(argv)
    text = render()
    if args.check:
        try:
            with open(args.out) as f:
                current = f.read()
        except OSError:
            current = ""
        if current != text:
            print(f"{args.out} is stale; run tools/gen_api_docs.py",
                  file=sys.stderr)
            return 1
        print(f"{args.out} is current")
        return 0
    with open(args.out, "w") as f:
        f.write(text)
    nsym = text.count("\n### ")
    print(f"wrote {args.out}: {len(MODULES)} modules, {nsym} symbols")
    return 0


if __name__ == "__main__":
    sys.exit(main())
