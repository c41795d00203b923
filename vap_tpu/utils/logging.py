"""Rank-aware logging with frequency-capped dedup.

Mirrors the reference FinetrainersLoggerAdapter (finetrainers/logging.py):
`logger.log_freq.info(msg, frequency=N)` logs every Nth occurrence of the
same callsite; non-zero hosts are silenced unless VAP_VERBOSE_LOGS is set.
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict

_LEVEL = os.environ.get("VAP_LOG_LEVEL", "INFO").upper()


def _is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # pragma: no cover
        return True


class _FreqProxy:
    def __init__(self, logger: logging.Logger):
        self._logger = logger
        self._counts = defaultdict(int)

    def _log(self, level, msg, frequency=1, **kw):
        key = (level, msg[:80])
        self._counts[key] += 1
        if (self._counts[key] - 1) % max(frequency, 1) == 0:
            self._logger.log(level, msg, **kw)

    def info(self, msg, frequency=1, **kw):
        self._log(logging.INFO, msg, frequency, **kw)

    def warning(self, msg, frequency=1, **kw):
        self._log(logging.WARNING, msg, frequency, **kw)

    def debug(self, msg, frequency=1, **kw):
        self._log(logging.DEBUG, msg, frequency, **kw)


class VAPLogger(logging.LoggerAdapter):
    def __init__(self, logger):
        super().__init__(logger, {})
        self.log_freq = _FreqProxy(logger)

    def process(self, msg, kwargs):
        return msg, kwargs


def get_logger(name: str = "vap_tpu") -> VAPLogger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(asctime)s %(levelname)s [%(name)s] %(message)s"))
        logger.addHandler(handler)
        verbose = os.environ.get("VAP_VERBOSE_LOGS")
        if _is_main_process() or verbose:
            logger.setLevel(getattr(logging, _LEVEL, logging.INFO))
        else:
            logger.setLevel(logging.ERROR)
    return VAPLogger(logger)
