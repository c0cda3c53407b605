"""Environment / seeding / logging utilities.

TPU-native equivalents of /root/reference/utils.py:
  * `setup_logger` (utils.py:12-21)
  * `log_environment` — python version, package freeze, env vars (utils.py:24-42)
  * `set_seeds` (utils.py:45-60) — in JAX, determinism is structural: all
    randomness flows through explicit PRNG keys, so "seeding" reduces to
    choosing the root key (returned here) plus numpy for the host pipeline.
    XLA is deterministic by default on TPU for a fixed program; no analogue
    of the reference's cuDNN/CUBLAS knobs is needed.
"""

from __future__ import annotations

import logging
import os
import platform
import sys
import numpy as np


def setup_logger(name: str = "base", log_file: str | None = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("[%(asctime)s][%(levelname)s] %(message)s", "%Y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def log_environment(logger: logging.Logger) -> None:
    import jax

    logger.info(f"Python version: {sys.version}")
    logger.info(f"Platform: {platform.platform()}")
    logger.info(f"JAX version: {jax.__version__}")
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            import importlib

            m = importlib.import_module(mod)
            logger.info(f"{mod} version: {getattr(m, '__version__', '?')}")
        except ImportError:
            pass
    try:
        logger.info(f"Devices: {jax.devices()}")
    except RuntimeError as e:  # backend init failure should not kill the run
        logger.info(f"Devices unavailable: {e}")
    for k, v in sorted(os.environ.items()):
        logger.debug(f"ENV {k}={v}")


def set_seeds(seed: int = 42):
    """Seed numpy (host pipeline) and return the root JAX PRNG key."""
    import jax

    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def parse_train_eval_mode(phase: str) -> bool:
    if phase not in ("train", "eval"):
        raise ValueError(f"phase must be 'train' or 'eval', got {phase}")
    return phase == "train"
