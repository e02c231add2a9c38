"""Console logging: colored output, duplicate-message suppression, singleton name.

Capability parity with the reference logger (reference: log.py:31-53): a single
logger named "logger" with colored level formatting and a filter that drops exact
duplicate messages. We avoid the colorlog/tqdm dependencies by emitting ANSI
colors directly and writing through a plain StreamHandler.
"""

from __future__ import annotations

import logging
import sys

_COLORS = {
    "DEBUG": "\033[36m",  # cyan
    "INFO": "\033[37m",  # white
    "WARNING": "\033[33m",  # yellow
    "ERROR": "\033[31m",  # red
    "CRITICAL": "\033[31;47m",  # red on white
}
_RESET = "\033[0m"


class ColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        color = _COLORS.get(record.levelname, "")
        if color and sys.stderr.isatty():
            return f"{color}{msg}{_RESET}"
        return msg


class DuplicateFilter(logging.Filter):
    """Drop messages whose text was already emitted once (reference: log.py:20-28)."""

    def __init__(self) -> None:
        super().__init__()
        self._seen: set = set()

    def filter(self, record: logging.LogRecord) -> bool:
        fresh = record.msg not in self._seen
        self._seen.add(record.msg)
        return fresh


def setup_custom_logger(name: str = "logger") -> logging.Logger:
    logger = logging.getLogger(name)
    if getattr(logger, "_shineon_configured", False):
        return logger
    formatter = ColorFormatter(
        "%(name)s | %(asctime)s | %(levelname)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    handler = logging.StreamHandler()
    handler.setFormatter(formatter)
    logger.setLevel(logging.DEBUG)
    logger.addHandler(handler)
    logger.addFilter(DuplicateFilter())
    logger._shineon_configured = True  # type: ignore[attr-defined]
    return logger


def get_logger() -> logging.Logger:
    return setup_custom_logger("logger")
