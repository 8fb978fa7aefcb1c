"""Structured logging with a verbosity gate.

Replaces the reference's scattered ``fprintf(stderr, ...)`` gated by an int
verbosity flag (``/root/reference/biogpt.h:119``) with standard logging;
``set_verbosity`` maps the reference's -v levels onto log levels.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s %(name)s %(levelname).1s] %(message)s"
_configured = False


def _configure() -> None:
    global _configured
    if _configured:
        return
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
    root = logging.getLogger("biogpt_tpu")
    root.addHandler(handler)
    root.setLevel(logging.WARNING)
    _configured = True


def get_logger(name: str = "") -> logging.Logger:
    _configure()
    return logging.getLogger(f"biogpt_tpu.{name}" if name else "biogpt_tpu")


def set_verbosity(level: int) -> None:
    """0 = warnings, 1 = info, 2+ = debug (mirrors the reference's -v)."""
    _configure()
    root = logging.getLogger("biogpt_tpu")
    root.setLevel(logging.WARNING if level <= 0
                  else logging.INFO if level == 1 else logging.DEBUG)
