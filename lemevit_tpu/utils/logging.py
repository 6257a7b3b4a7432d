"""Logging: rank-0 console + rotating file handler, stdout tee.

Mirrors the reference's utils/logger.py surface (Logger tee at :31-44,
setup_default_logging with 2MB x3 rotation at :57-66)."""
from __future__ import annotations

import logging
import logging.handlers
import sys
from typing import Optional


class TeeLogger:
    """Tee stdout to a file (reference Logger semantics)."""

    def __init__(self, path: str, stream=None):
        self.stream = stream or sys.stdout
        self.file = open(path, "a")

    def write(self, msg):
        self.stream.write(msg)
        self.file.write(msg)

    def flush(self):
        self.stream.flush()
        self.file.flush()


def setup_logging(log_path: Optional[str] = None,
                  level: int = logging.INFO,
                  rank: int = 0) -> logging.Logger:
    logger = logging.getLogger("lemevit_tpu")
    logger.setLevel(level if rank == 0 else logging.WARNING)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_path and rank == 0:
        fh = logging.handlers.RotatingFileHandler(
            log_path, maxBytes=2 * 1024 * 1024, backupCount=3)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
