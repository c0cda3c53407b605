"""Driver-contract tests: bench.py prints exactly ONE JSON line with the
required keys; __graft_entry__.entry() is jittable; dryrun_multichip runs on
the virtual CPU mesh."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_single_json_line():
    env = dict(os.environ)
    env.update({
        "NFDPM_BENCH_BATCH": "8",
        "NFDPM_BENCH_CHAIN": "2",
        "NFDPM_BENCH_WIDTH": "16",
        "NFDPM_BENCH_DDPM_BATCH": "2",
        "NFDPM_BENCH_DDPM_T": "4",
        "JAX_PLATFORMS": "cpu",
        "NFDPM_FORCE_CPU": "1",
    })
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import runpy; runpy.run_path('bench.py', run_name='__main__')"],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.strip().splitlines()
                  if l.startswith("{")]
    assert len(json_lines) == 1, out.stdout
    rec = json.loads(json_lines[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0
    # VERDICT r4 weak #1: the bench must be statistically honest — median of
    # N>=3 independently timed trials with the min/max spread recorded
    disp = rec["dispersion"]
    assert disp["trials"] >= 3
    assert disp["min"] <= rec["value"] <= disp["max"]
    assert "spread_pct" in disp


def test_graft_entry_compiles():
    import jax

    sys.path.insert(0, ROOT)
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    import numpy as np

    assert np.isfinite(float(out))


import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    """Replays the exact driver dryrun (budget-gated legs, see
    __graft_entry__.dryrun_multichip). Slow tier: ~6-8 min cold on a
    1-core CPU host — run with `pytest -m slow --override-ini addopts=''`."""
    sys.path.insert(0, ROOT)
    import __graft_entry__ as g

    g.dryrun_multichip(8)
