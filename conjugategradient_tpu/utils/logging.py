"""Logging — rebuild of the reference's compile-time Debuglevel tracing.

The reference gates ``std::clog`` prints behind a template enum
(LinearAlgebraTypes.hpp:26-30; used at CG.hpp:63-64,257-258,292-295,306-308,
337-339,356-358,428-434).  Here that becomes standard Python logging with a
module-level verbosity switch; inside jitted code nothing logs (by design —
solve metadata is *returned* as CGInfo instead, SURVEY §5).
"""

from __future__ import annotations

import logging

_LOGGER_NAME = "conjugategradient_tpu"


def get_logger(name: str = _LOGGER_NAME) -> logging.Logger:
    return logging.getLogger(name)


def set_verbosity(level: str = "info"):
    """'none' | 'info' | 'verbose' (≈ the reference's None/Verbose enum)."""
    lut = {
        "none": logging.WARNING,
        "info": logging.INFO,
        "verbose": logging.DEBUG,
    }
    logger = get_logger()
    logger.setLevel(lut.get(level, logging.INFO))
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[%(name)s] %(levelname)s %(message)s"))
        logger.addHandler(h)
