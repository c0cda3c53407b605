"""Trained-trajectory parity vs the PyTorch reference.

Co-trains the SAME tiny Glow in both frameworks — identical initial weights
(torch ddinit state imported), identical deterministic batches, identical
injected dequantization noise, Adam lr=1e-3, and the reference's
clip-value(1)-then-clip-norm(1) order
(/root/reference/normalizing_flow/trainer.py:147-233) — and asserts the BPD
curves track step-by-step. Harness: tools/cotrain_parity.py (also produces
docs/training_parity_bpd.png).

This requires the reference's exact invconv parameterization
(GlowConfig.invconv_param="full"): Adam is not invariant to the PLU
reparameterization, so the default TPU-fast PLU path would diverge from the
reference trajectory even from identical weights (single-step gradient parity
is covered in test_parity_reference.py for the shared leaves).

The jitted step under test is the REAL product train step
(training/nf_trainer.make_train_step with inject_noise=True) driving the real
optimizer chain (training/optim.make_optimizer with fixed_prior=True —
the reference optimizer covers flow.parameters() only, trainer.py:109).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "normalizing_flow")),
    reason="reference repo not mounted",
)

pytest.importorskip("torch")

N_STEPS = 120
TRACK_STEPS = 20  # strict per-step window (VERDICT round-1 item #1)


@pytest.fixture(scope="module")
def trajectories():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from cotrain_parity import cotrain

    return cotrain(n_steps=N_STEPS)


def test_bpd_curve_tracks_stepwise(trajectories):
    """First TRACK_STEPS optimizer steps: BPD within 1e-3 bits/dim per step."""
    bpd_ref, bpd_jax = trajectories
    err = np.abs(bpd_ref[:TRACK_STEPS] - bpd_jax[:TRACK_STEPS])
    assert err.max() < 1e-3, f"per-step bpd error {err.max():.2e} at step {err.argmax()}"


def test_bpd_curve_end_within_noise(trajectories):
    """End of the run: curves agree within accumulated-fp-noise tolerance and
    both moved the same way (the training dynamics match, not just the first
    few steps)."""
    bpd_ref, bpd_jax = trajectories
    tail_ref, tail_jax = bpd_ref[-10:].mean(), bpd_jax[-10:].mean()
    assert abs(tail_ref - tail_jax) < 2e-2, (
        f"final bpd diverged: ref {tail_ref:.4f} vs jax {tail_jax:.4f}"
    )
    # same net BPD improvement over the run (dynamics, not just endpoints)
    delta_ref = bpd_ref[0] - tail_ref
    delta_jax = bpd_jax[0] - tail_jax
    assert abs(delta_ref - delta_jax) < 2e-2, (
        f"improvement diverged: ref {delta_ref:.4f} vs jax {delta_jax:.4f}"
    )
    # whole-curve agreement (absorbs fp32-vs-fp64 accumulator drift)
    err = np.abs(bpd_ref - bpd_jax)
    assert np.median(err) < 5e-3, f"median curve error {np.median(err):.2e}"
