#!/usr/bin/env python3
"""Generate API reference docs from the package's docstrings.

The reference ships a Doxygen target (``/root/reference/CMakeLists.txt:21-26``:
``doxygen Doxyfile`` over the annotated headers); this is the rebuild's
equivalent — a zero-dependency generator that walks the public API surface
(``__all__`` of each documented module), captures signatures via
``inspect.signature`` and the docstrings the code already carries, and emits
one Markdown file.  Run it after API changes:

    python tools/gen_api_docs.py                 # writes docs/api_reference.md
    python tools/gen_api_docs.py -o - | less     # preview to stdout

``docs/api.md`` stays the curated, example-driven guide; the generated file
is the exhaustive symbol-by-symbol reference (the Doxygen-output analogue).
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import os
import re
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU is fine (and fast) for doc generation; dodge the axon TPU plugin that
# a sitecustomize may register at interpreter start.
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - jax always present in this image
    pass

# (module, heading, blurb) — order defines the document.
MODULES = [
    ("conjugategradient_tpu", "Top level",
     "Everything below is importable from the package root where listed in "
     "its `__all__`."),
    ("conjugategradient_tpu.types", "Operators (`types`)", ""),
    ("conjugategradient_tpu.solver.cg", "Core solver (`solver.cg`)", ""),
    ("conjugategradient_tpu.solver.batched", "Multi-RHS lockstep (`solver.batched`)", ""),
    ("conjugategradient_tpu.solver.blockcg", "Block CG (`solver.blockcg`)", ""),
    ("conjugategradient_tpu.solver.pipelined", "Pipelined CG (`solver.pipelined`)", ""),
    ("conjugategradient_tpu.solver.sstep", "s-step CG (`solver.sstep`)", ""),
    ("conjugategradient_tpu.solver.refine", "Mixed-precision CG-IR (`solver.refine`)", ""),
    ("conjugategradient_tpu.solver.precond", "Preconditioners (`solver.precond`)", ""),
    ("conjugategradient_tpu.solver.fused", "Fused TPU fast path (`solver.fused`)", ""),
    ("conjugategradient_tpu.solver.fused_stencil", "Fused stencil path (`solver.fused_stencil`)", ""),
    ("conjugategradient_tpu.solver.checkpoint", "Checkpoint/resume (`solver.checkpoint`)", ""),
    ("conjugategradient_tpu.solver.restart", "Periodic-restart loops (`solver.restart`)", ""),
    ("conjugategradient_tpu.ops.blas", "BLAS-1 kernels (`ops.blas`)", ""),
    ("conjugategradient_tpu.ops.spmv", "SpMV kernels (`ops.spmv`)", ""),
    ("conjugategradient_tpu.ops.stencil", "Stencil kernels (`ops.stencil`)", ""),
    ("conjugategradient_tpu.parallel", "Multi-chip sharding (`parallel`)", ""),
    ("conjugategradient_tpu.io", "MatrixMarket / ingest (`io`)", ""),
    ("conjugategradient_tpu.problems", "Problem generators (`problems`)", ""),
    ("conjugategradient_tpu.oracle", "Float64 parity oracle (`oracle`)", ""),
    ("conjugategradient_tpu.reorder", "RCM / degree-sort reordering (`reorder`)", ""),
    ("conjugategradient_tpu.compat", "Reference-API shim (`compat`)", ""),
    ("conjugategradient_tpu.scipy_compat", "scipy drop-in (`scipy_compat`)", ""),
    ("conjugategradient_tpu.utils", "Observability (`utils`)", ""),
]


def _public_names(mod) -> list[str]:
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n, obj in vars(mod).items()
                 if not n.startswith("_")
                 and getattr(obj, "__module__", None) == mod.__name__]
    return list(names)


def _signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # default values whose repr embeds a memory address (`<function dot at
    # 0x7f...>`) made the output non-reproducible run to run — scrub the
    # address so the committed doc byte-matches regeneration
    return re.sub(r" at 0x[0-9a-fA-F]+", "", sig)


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else "*(undocumented)*"


def _emit_symbol(out: list[str], name: str, obj, depth: int = 3) -> None:
    h = "#" * depth
    if inspect.isclass(obj):
        out.append(f"{h} class `{name}{_signature(obj)}`\n")
        out.append(_doc(obj) + "\n")
        for mname, m in sorted(vars(obj).items()):
            if mname.startswith("_"):
                continue
            func = None
            prefix = ""
            if isinstance(m, (staticmethod, classmethod)):
                func, prefix = m.__func__, f"{type(m).__name__} "
            elif inspect.isfunction(m):
                func = m
            elif isinstance(m, property):
                doc = inspect.getdoc(m)
                if doc:
                    out.append(f"- **`.{mname}`** (property) — "
                               f"{doc.splitlines()[0]}\n")
                continue
            if func is None or not inspect.getdoc(func):
                continue
            out.append(f"- **{prefix}`.{mname}{_signature(func)}`** — "
                       f"{inspect.getdoc(func).splitlines()[0]}\n")
    elif callable(obj):
        out.append(f"{h} `{name}{_signature(obj)}`\n")
        out.append(_doc(obj) + "\n")
    else:
        out.append(f"{h} `{name}` = `{obj!r}`\n")
        out.append(_doc(type(obj)).splitlines()[0] + "\n"
                   if inspect.getdoc(type(obj)) else "")


def generate() -> str:
    out: list[str] = [
        "# API reference (generated)\n",
        "Generated from the package docstrings by `tools/gen_api_docs.py` — "
        "the rebuild's counterpart of the reference's Doxygen target "
        "(`/root/reference/CMakeLists.txt:21-26`).  Regenerate after API "
        "changes; see `docs/api.md` for the curated guide with examples.\n",
    ]
    seen_top: set[int] = set()
    for modname, heading, blurb in MODULES:
        mod = importlib.import_module(modname)
        out.append(f"\n## {heading}\n")
        mdoc = inspect.getdoc(mod)
        if mdoc:
            # first paragraph of the module docstring as the section intro
            out.append(mdoc.split("\n\n")[0].strip() + "\n")
        if blurb:
            out.append(blurb + "\n")
        for name in _public_names(mod):
            if name == "__version__":
                continue
            obj = getattr(mod, name)
            if modname == "conjugategradient_tpu":
                seen_top.add(id(obj))
            elif id(obj) in seen_top and inspect.isclass(obj):
                out.append(f"### `{name}` — re-exported at top level\n")
                continue
            _emit_symbol(out, name, obj)
    return "\n".join(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=textwrap.dedent(__doc__ or "").strip())
    ap.add_argument("-o", "--output",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "docs", "api_reference.md"),
                    help="output path, or '-' for stdout")
    args = ap.parse_args(argv)
    text = generate()
    if args.output == "-":
        sys.stdout.write(text)
    else:
        with open(args.output, "w") as f:
            f.write(text)
        print(f"wrote {os.path.normpath(args.output)} "
              f"({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
