"""Rank-aware logging (the equivalent of ev-YOLOv6/yolov6/utils/events.py
LOGGER, :10-20): only process 0 logs above WARNING."""
from __future__ import annotations

import logging

import jax


def get_logger(name: str = "ers_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(name)s: %(message)s"))
        logger.addHandler(h)
        level = logging.INFO if jax.process_index() == 0 else logging.WARNING
        logger.setLevel(level)
    return logger
