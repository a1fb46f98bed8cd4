"""Serving logger config (ref Emu2/demo/common/utils.py:47-83):
console + weekly TimedRotatingFileHandler with 90 backups, per-request
log ids."""

from __future__ import annotations

import logging
import os
import uuid
from logging.handlers import TimedRotatingFileHandler

FMT = ("[%(levelname)s] %(asctime)s "
       "[%(filename)s:%(lineno)d] %(message)s")
DATEFMT = "%Y-%m-%d %H:%M:%S"


def config_logger(logger: logging.Logger, log_dir: str = "log",
                  name: str = "backend") -> logging.Logger:
    logger.setLevel(logging.INFO)
    formatter = logging.Formatter(fmt=FMT, datefmt=DATEFMT)
    console = logging.StreamHandler()
    console.setFormatter(formatter)
    logger.addHandler(console)
    os.makedirs(log_dir, exist_ok=True)
    fh = TimedRotatingFileHandler(
        os.path.join(log_dir, f"{name}.log"), when="W6", backupCount=90)
    fh.setFormatter(formatter)
    logger.addHandler(fh)
    return logger


def get_log_id() -> str:
    return uuid.uuid4().hex
