"""Structured logging (replaces the reference's std::cout prints scattered
through MTPC/sceneManagement.cpp:72,186-187, MTPC/BVH.cpp:53,60,83 and the
per-scanline progress print MTPC/pathTracing.cpp:328)."""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def get_logger(name: str = "mcpt_tpu") -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        level = os.environ.get("MCPT_TPU_LOGLEVEL", "INFO").upper()
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname).1s %(name)s: %(message)s",
                              datefmt="%H:%M:%S")
        )
        root = logging.getLogger("montecarlopathtracing_tpu")
        root.addHandler(handler)
        root.setLevel(level)
        _CONFIGURED = True
    return logging.getLogger(name)
