"""Worker process for the 2-process jax.distributed CPU test.

Launched by tests/test_distributed.py as
    python tests/_distributed_worker.py <process_id> <coordinator_port>

Each process owns 2 virtual CPU devices; the global (data=4,) mesh spans both
processes. The worker assembles a globally-sharded batch from its local slice
via nfdpm_tpu.parallel.distributed.global_batch_from_local and verifies a
jitted global reduction sees BOTH processes' data (the cross-host analogue of
SURVEY.md §5.8's deterministic per-host data sharding).
"""

import os
import sys

proc_id = int(sys.argv[1])
port = int(sys.argv[2])

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nfdpm_tpu.parallel import mesh as mesh_m  # noqa: E402
from nfdpm_tpu.parallel.distributed import (  # noqa: E402
    global_batch_from_local,
    initialize,
    process_info,
)

initialize(coordinator_address=f"localhost:{port}", num_processes=2,
           process_id=proc_id)

info = process_info()
assert info["process_count"] == 2, info
assert info["process_index"] == proc_id, info

mesh = mesh_m.make_mesh(n_data=4, n_model=1, devices=jax.devices())

# Each process contributes a distinct half of the global batch: process p
# holds rows [p*4, p*4+4) of the global [8, 3] batch.
local = (np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + proc_id * 12.0)
global_batch = global_batch_from_local(mesh, local)
assert global_batch.shape == (8, 3), global_batch.shape

with mesh:
    total = jax.jit(jnp.sum)(global_batch)

expected = float(np.arange(24, dtype=np.float32).sum())  # both halves
got = float(total)
assert got == expected, f"global sum {got} != {expected} (missing a host's shard?)"

# distribute_batch: every host holds the same global batch; each takes its
# host_shard slice and the assembled global array must reduce identically.
from nfdpm_tpu.parallel.distributed import distribute_batch  # noqa: E402

full = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
dist = distribute_batch(mesh, full)
assert dist.shape == (8, 3), dist.shape
with mesh:
    total2 = float(jax.jit(jnp.sum)(dist))
assert total2 == float(full.sum()), f"distribute_batch sum {total2}"
print(f"WORKER_OK {proc_id} sum={got}")
