"""Test bootstrap: force an 8-device virtual CPU mesh.

This is the TPU-native analogue of "multi-node tests without a cluster"
(SURVEY.md §4): sharding/mesh tests run against
`--xla_force_host_platform_device_count=8` on CPU; the driver separately
dry-runs the real multi-chip path via __graft_entry__.dryrun_multichip.

Note: this environment's axon TPU plugin force-selects `jax_platforms=
"axon,cpu"` at interpreter start (sitecustomize), so the env-var route is
not enough — we override via jax.config after import, before any backend
is instantiated.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ["JAX_PLATFORMS"] = "cpu"  # keep env consistent with the config
# choice below: production code re-asserts JAX_PLATFORMS via
# utils.env.honor_platform_env, and an ambient =axon would otherwise flip
# in-process CLI tests' successors onto the real TPU chip.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the suite is compile-dominated (~20 min cold);
# warm re-runs reuse executables across processes/runs. Keyed by the host's
# CPU-feature fingerprint: XLA:CPU AOT entries written on a different machine
# fail to load (loudly, per entry) and are slower than compiling cold.
from nfdpm_tpu.utils.env import machine_fingerprint  # noqa: E402

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache", machine_fingerprint())
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
