"""Bit-exact resume: epoch-level and mid-epoch (greenfield vs the
reference, whose recovery restarts the data order from scratch and loses
the interrupted epoch — normalizing_flow/trainer.py:111-122).

Three guarantees under test:
  1. `Loader.iter_epoch(epoch, start_batch)` is a pure function of
     (seed, epoch) — shuffle order AND hflip draws — and `start_batch`
     yields exactly the tail of the full epoch.
  2. Epoch-level resume reproduces the uninterrupted run's final params
     bit-exactly (data stream, dequant keys, and optimizer all align).
  3. A KeyboardInterrupt mid-epoch writes `checkpoints/mid_epoch.json`,
     and resuming with the recorded (epoch, batch) reproduces the
     uninterrupted run bit-exactly.
"""

import os

import jax
import numpy as np
import pytest

from nfdpm_tpu.data.pipeline import read_dataset
from nfdpm_tpu.models import glow as glow_m
from nfdpm_tpu.training import nf_trainer as nft
from nfdpm_tpu.training.checkpoint import load_mid_epoch_marker
from nfdpm_tpu.utils.env import setup_logger

CFG = glow_m.GlowConfig(in_channels=3, levels=2, steps=1, coupling_width=16)
TCFG = nft.NFTrainConfig(epochs=2, lr=1e-3, print_freq=100,
                         save_checkpoint_freq=50)


def _loaders():
    # fresh loaders per trainer invocation: construction is deterministic,
    # so every scenario sees identical data
    return read_dataset("synthetic", root="", batch_size=8, img_size=8,
                        synthetic_fallback=True, synthetic_n=48,
                        transformations=["RandomHorizontalFlip"])


def _params_equal(a, b):
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)), a, b)


def test_loader_iter_epoch_pure_and_skippable():
    train = _loaders().train
    assert train.shuffle and train.random_hflip

    def collect(epoch, start=0):
        return [(i.copy(), l.copy())
                for i, l in train.iter_epoch(epoch, start_batch=start)]

    full = collect(epoch=3)
    again = collect(epoch=3)
    for (i1, l1), (i2, l2) in zip(full, again):
        np.testing.assert_array_equal(i1, i2)  # incl. identical hflips
        np.testing.assert_array_equal(l1, l2)

    tail = collect(epoch=3, start=2)
    assert len(tail) == len(full) - 2
    for (i1, l1), (i2, l2) in zip(full[2:], tail):
        np.testing.assert_array_equal(i1, i2)  # hflip draws stay aligned
        np.testing.assert_array_equal(l1, l2)

    other = collect(epoch=4)
    assert any(not np.array_equal(i1, i2)
               for (i1, _), (i2, _) in zip(full, other))

    # plain iteration (internal counter) still walks distinct epochs
    e0 = [l.copy() for _, l in train]
    e1 = [l.copy() for _, l in train]
    assert any(not np.array_equal(a, b) for a, b in zip(e0, e1))


def test_epoch_level_resume_bit_exact(tmp_path):
    logger = setup_logger("test_resume")

    run_a = str(tmp_path / "uninterrupted")
    os.makedirs(run_a)
    out_a = nft.train(cfg=CFG, tcfg=TCFG, loaders=_loaders(), run_dir=run_a,
                      logger=logger, img_size=8)

    run_b = str(tmp_path / "split")
    os.makedirs(run_b)
    tcfg1 = nft.NFTrainConfig(**{**TCFG.__dict__, "epochs": 1})
    nft.train(cfg=CFG, tcfg=tcfg1, loaders=_loaders(), run_dir=run_b,
              logger=logger, img_size=8)
    out_b = nft.train(cfg=CFG, tcfg=tcfg1, loaders=_loaders(), run_dir=run_b,
                      logger=logger, img_size=8,
                      resume_dir=run_b, resume_epoch=1)

    _params_equal(out_a["state"]["params"], out_b["state"]["params"])
    assert int(out_a["state"]["step"]) == int(out_b["state"]["step"])


class _InterruptAfter:
    """Loader proxy raising KeyboardInterrupt before yielding batch N of
    any epoch (simulates Ctrl-C mid-epoch; the exception reaches the
    trainer's main loop through prefetch_to_device's producer thread)."""

    def __init__(self, loader, n):
        self._loader, self._n = loader, n

    def __getattr__(self, name):
        return getattr(self._loader, name)

    def __len__(self):
        return len(self._loader)

    def __iter__(self):
        return iter(self._loader)

    def iter_epoch(self, epoch, start_batch=0):
        for i, item in enumerate(
                self._loader.iter_epoch(epoch, start_batch=start_batch)):
            if start_batch + i >= self._n:
                raise KeyboardInterrupt
            yield item


def test_mid_epoch_resume_bit_exact(tmp_path):
    logger = setup_logger("test_resume_mid")
    tcfg = nft.NFTrainConfig(**{**TCFG.__dict__, "epochs": 1})

    run_a = str(tmp_path / "uninterrupted")
    os.makedirs(run_a)
    out_a = nft.train(cfg=CFG, tcfg=tcfg, loaders=_loaders(), run_dir=run_a,
                      logger=logger, img_size=8)

    # interrupt after 3 of the 6 batches of epoch 1
    run_b = str(tmp_path / "interrupted")
    os.makedirs(run_b)
    loaders = _loaders()
    loaders = type(loaders)(train=_InterruptAfter(loaders.train, 3),
                            val=loaders.val, test=loaders.test,
                            eval=loaders.eval)
    with pytest.raises(KeyboardInterrupt):
        nft.train(cfg=CFG, tcfg=tcfg, loaders=loaders, run_dir=run_b,
                  logger=logger, img_size=8)

    marker = load_mid_epoch_marker(run_b)
    assert marker == {"prefix": "gaussian", "epoch": 1, "batch_in_epoch": 3}

    out_b = nft.train(cfg=CFG, tcfg=tcfg, loaders=_loaders(), run_dir=run_b,
                      logger=logger, img_size=8, resume_dir=run_b,
                      resume_epoch=marker["epoch"],
                      resume_batch=marker["batch_in_epoch"])

    _params_equal(out_a["state"]["params"], out_b["state"]["params"])
    assert int(out_a["state"]["step"]) == int(out_b["state"]["step"])
    # a normally-completed run clears the marker
    assert load_mid_epoch_marker(run_b) is None


def test_mid_epoch_resume_diffusion(tmp_path):
    """Same mid-epoch guarantee for the stage-2 trainer (frozen flow)."""
    from nfdpm_tpu.models.diffusion_prior import DiffusionPrior
    from nfdpm_tpu.models.formaters import IdentityFormater
    from nfdpm_tpu.models.nf_backbone import NFBackbone
    from nfdpm_tpu.training import diffusion_trainer as dt

    logger = setup_logger("test_resume_diff")
    backbone = NFBackbone(cfg=CFG, img_size=8, frozen=True)
    flow_params = glow_m.init_glow(0, CFG)
    dcfg = dt.DiffusionTrainConfig(epochs=1, lr_diffusion=1e-3,
                                   print_freq=100, save_checkpoint_freq=50,
                                   ema_decay=0.9, ema_update_every=2)

    def make_dp():
        return DiffusionPrior(
            formater=IdentityFormater(L=CFG.levels,
                                      in_channels=CFG.in_channels, size=8),
            unet_kwargs={"dim": 8, "dim_mults": (1,),
                         "resnet_block_groups": 2},
            diffusion_kwargs={"timesteps": 4, "loss_type": "l2"},
        )

    run_a = str(tmp_path / "uninterrupted")
    os.makedirs(run_a)
    out_a = dt.train(backbone=backbone, flow_params=flow_params, dp=make_dp(),
                     tcfg=dcfg, loaders=_loaders(), run_dir=run_a,
                     logger=logger)

    run_b = str(tmp_path / "interrupted")
    os.makedirs(run_b)
    loaders = _loaders()
    loaders = type(loaders)(train=_InterruptAfter(loaders.train, 3),
                            val=loaders.val, test=loaders.test,
                            eval=loaders.eval)
    with pytest.raises(KeyboardInterrupt):
        dt.train(backbone=backbone, flow_params=flow_params, dp=make_dp(),
                 tcfg=dcfg, loaders=loaders, run_dir=run_b, logger=logger)
    marker = load_mid_epoch_marker(run_b)
    assert marker == {"prefix": "diffusion", "epoch": 1, "batch_in_epoch": 3}

    out_b = dt.train(backbone=backbone, flow_params=flow_params, dp=make_dp(),
                     tcfg=dcfg, loaders=_loaders(), run_dir=run_b,
                     logger=logger, resume_dir=run_b,
                     resume_epoch=marker["epoch"],
                     resume_batch=marker["batch_in_epoch"])

    _params_equal(out_a["state"]["params"]["diffusion"],
                  out_b["state"]["params"]["diffusion"])
    _params_equal(out_a["state"]["ema"], out_b["state"]["ema"])
