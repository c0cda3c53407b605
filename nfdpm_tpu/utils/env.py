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


DEFAULT_COMPILE_CACHE = os.path.expanduser("~/.nfdpm_tpu/jax_cache")


def machine_fingerprint() -> str:
    """Short stable fingerprint of THIS host's CPU feature set.

    XLA:CPU persists AOT-compiled executables whose cache key does NOT
    include the compile host's CPU features; loading an entry written on a
    machine with different features fails loudly per entry
    ("Machine type used for XLA:CPU compilation doesn't match ...",
    cpu_aot_loader.cc) and can be slower than compiling cold. Keying the
    cache directory by the host's cpuinfo flags makes a foreign cache
    simply invisible instead of poisonous."""
    import hashlib

    h = hashlib.sha256()
    h.update(platform.machine().encode())
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):  # x86 / arm
                    h.update(line.encode())
                    break
    except OSError:  # non-Linux: fall back to the coarse processor string
        h.update(platform.processor().encode())
    return h.hexdigest()[:12]


def honor_platform_env() -> None:
    """Make `JAX_PLATFORMS=cpu python run_*.py ...` actually select CPU.

    This environment's TPU plugin force-selects `jax_platforms="axon,cpu"`
    from sitecustomize at interpreter start, AFTER jax has consumed the
    JAX_PLATFORMS env var — so the documented env-var route silently loses
    and a CLI started with JAX_PLATFORMS=cpu still initializes the axon
    backend (and hangs if the TPU tunnel is down). Re-assert the user's
    explicit choice via jax.config before any backend is instantiated.
    No-op when the env var is unset or backends are already live."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        # Backends already instantiated => an embedding process (e.g. the
        # test suite, which pins jax_platforms="cpu" in conftest and has
        # run computations) made its choice; flipping jax_platforms now
        # would silently move every SUBSEQUENT compile onto the ambient
        # platform (on this box: the real TPU, whose bf16 MXU rounding
        # breaks tight-precision CPU tests that happen to run after an
        # in-process CLI call). Only assert the env choice while no
        # backend is live.
        from jax._src import xla_bridge

        if getattr(xla_bridge, "_backends", None):
            return
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except (AttributeError, ImportError, RuntimeError):  # old jax layouts
        pass


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Persistent XLA compilation cache shared by every CLI process.

    First compiles of the diffusion sampler/interpolation chains cost
    10-25 minutes over a tunneled TPU backend; without a persistent cache
    every `run_*.py` / `tools/*.py` invocation pays that again (process ==
    compile scope). One shared on-disk cache makes it a one-time cost.
    Opt out with NFDPM_NO_COMPILE_CACHE=1 (e.g. for compile benchmarking);
    override the base location with NFDPM_COMPILE_CACHE=<dir>.

    The final directory is <base>/<machine_fingerprint()> so entries
    AOT-compiled on a host with different CPU features are never loaded
    (each failed XLA:CPU AOT load logs an error and recompiles — a cache
    written elsewhere is worse than no cache; see MULTICHIP_r03).

    Also honors an explicit JAX_PLATFORMS env choice (every CLI calls this
    first — see honor_platform_env)."""
    honor_platform_env()
    if os.environ.get("NFDPM_NO_COMPILE_CACHE"):
        return None
    import jax

    current = getattr(jax.config, "jax_compilation_cache_dir", None)
    if current:  # already configured (e.g. the test suite's cache) — keep it
        return current
    base = (cache_dir or os.environ.get("NFDPM_COMPILE_CACHE")
            or DEFAULT_COMPILE_CACHE)
    cache_dir = os.path.join(base, machine_fingerprint())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):  # read-only FS / very old jax
        return None
    return cache_dir


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
