"""Console entry points for the installed package.

``tester.py`` / ``tools/make_problem.py`` remain runnable from a source
checkout; these wrappers expose the same programs as ``cgtpu-tester`` and
``cgtpu-make-problem`` when the package is pip-installed (pyproject.toml
[project.scripts]).
"""

from __future__ import annotations

import os
import sys


def _repo_root_on_path():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if here not in sys.path:
        sys.path.insert(0, here)
    return here


def tester_main() -> int:
    _repo_root_on_path()
    try:
        from tester import main
    except ImportError as e:  # installed without the repo scripts
        raise SystemExit(
            "cgtpu-tester needs the repository's tester.py on PYTHONPATH "
            f"(import failed: {e})"
        )
    return main()


def make_problem_main() -> int:
    _repo_root_on_path()
    try:
        from tools.make_problem import main
    except ImportError as e:
        raise SystemExit(
            "cgtpu-make-problem needs the repository's tools/ on PYTHONPATH "
            f"(import failed: {e})"
        )
    return main()
