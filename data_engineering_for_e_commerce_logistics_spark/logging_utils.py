"""Stage-tagged structured logging — SURVEY §2.10 O7.

Reference: src/utils/logger.py:73-122 — per-stage loggers emitting
structured records with pipeline stage and row counts.  Plain stdlib
logging here; Spark's log4j handles the JVM side.
"""

from __future__ import annotations

import json
import logging
import sys
import time


class StageLogger:
    """Logger bound to a pipeline stage, emitting JSON lines with
    stage/event/rows fields (ref logger.py:73-122)."""

    def __init__(self, stage: str, logger: logging.Logger | None = None):
        self.stage = stage
        self._log = logger or get_logger(f"engine.{stage}")

    def event(self, event: str, **fields) -> None:
        payload = {"stage": self.stage, "event": event, "ts": time.time(), **fields}
        self._log.info(json.dumps(payload, default=str))

    def rows(self, event: str, count: int, **fields) -> None:
        self.event(event, rows=count, **fields)


def get_logger(name: str = "engine", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return logger
