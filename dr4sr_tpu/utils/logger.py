"""Logging singleton (reference ``utils/logger.py``: logger 'CDR' with
stream + file handlers; ours is 'dr4sr')."""

from __future__ import annotations

import logging
import os
from typing import Optional

_LOGGER_NAME = "dr4sr"


def get_logger(log_path: Optional[str] = None, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter("[%(asctime)s] %(levelname)s %(message)s"))
        logger.addHandler(sh)
    if log_path is not None:
        full = os.path.join("log", log_path) if not os.path.isabs(log_path) else log_path
        os.makedirs(os.path.dirname(full), exist_ok=True)
        # one active file sink: drop handlers for other files so chunked
        # in-process suite runs don't append later jobs to earlier logs
        for h in list(logger.handlers):
            if (isinstance(h, logging.FileHandler)
                    and h.baseFilename != os.path.abspath(full)):
                logger.removeHandler(h)
                h.close()
        if not any(
            isinstance(h, logging.FileHandler) and h.baseFilename == os.path.abspath(full)
            for h in logger.handlers
        ):
            fh = logging.FileHandler(full)
            fh.setFormatter(logging.Formatter("[%(asctime)s] %(levelname)s %(message)s"))
            logger.addHandler(fh)
    return logger
