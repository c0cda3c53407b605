"""Rebuild trained models from a run directory alone.

The reference can only re-instantiate a model by re-running its experiment
entry point with the original hydra config in scope
(/root/reference/run_baseline_experiment.py:40-74); a checkpoint file by
itself is not enough to reconstruct the architecture. Here every run dir
persists its full architecture (`architecture.json` from the NF trainer,
`diffusion_architecture.json` from the stage-2 entry point), so any
consumer — the generation CLI, the interpolation CLI, later eval jobs —
can rebuild the exact model from the directory with no config.

`restore_params` returns host numpy leaves, so checkpoints saved under
any mesh topology restore onto the current devices (placement happens on
first jit call; see tests/test_parallel.py cross-topology cases).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax

from ..models import glow as glow_m
from .checkpoint import latest_epoch, load_architecture, restore_params


def resolve_run_dir(name: str) -> str:
    """Accept a run dir path or its name under ./outputs."""
    for cand in (name, os.path.join("outputs", name)):
        if os.path.isdir(os.path.join(cand, "checkpoints")):
            return cand
    raise FileNotFoundError(
        f"no run dir with checkpoints/ at '{name}' or 'outputs/{name}'")


def detect_kind(run_dir: str) -> tuple:
    """('diffusion'|'gaussian', newest_epoch) — diffusion wins if both."""
    for prefix in ("diffusion", "gaussian"):
        e = latest_epoch(run_dir, prefix)
        if e is not None:
            return prefix, e
    raise FileNotFoundError(
        f"no model_gaussian_*/model_diffusion_* checkpoints in "
        f"{run_dir}/checkpoints")


@dataclasses.dataclass(frozen=True)
class GlowRun:
    gcfg: glow_m.GlowConfig
    tcfg: Any                    # NFTrainConfig
    params: Dict[str, Any]
    img_size: int
    temperature: float
    epoch: int


@dataclasses.dataclass(frozen=True)
class DiffusionRun:
    backbone: Any                # NFBackbone
    dp: Any                      # DiffusionPrior
    tcfg: Any                    # DiffusionTrainConfig
    params: Dict[str, Any]       # {'flow': ..., 'diffusion': ...}
    img_size: int
    temperature: float
    epoch: int


def _require_epoch(run_dir: str, prefix: str,
                   epoch: Optional[int]) -> int:
    if epoch is None:
        epoch = latest_epoch(run_dir, prefix)
    if epoch is None:
        raise FileNotFoundError(
            f"no model_{prefix}_* checkpoints in {run_dir}/checkpoints")
    return int(epoch)


def _config_temperature(run_dir: str) -> Optional[float]:
    """model.training.temperature from the run's persisted config.yaml —
    fallback for architecture files that predate the temperature field."""
    path = os.path.join(run_dir, "config.yaml")
    if not os.path.exists(path):
        return None
    import yaml

    from ..utils.config import Config

    t = Config(yaml.safe_load(open(path))).select("model.training.temperature")
    return float(t) if t is not None else None


def load_glow_run(run_dir: str, epoch: Optional[int] = None) -> GlowRun:
    from . import nf_trainer as nft

    run_dir = resolve_run_dir(run_dir)
    epoch = _require_epoch(run_dir, "gaussian", epoch)
    arch = load_architecture(run_dir)
    gcfg = glow_m.GlowConfig(
        in_channels=int(arch["in_channels"]), levels=int(arch["L"]),
        steps=int(arch["K"]),
        coupling_width=int(arch.get("coupling_width", 512)),
        learn_prior=bool(arch.get("learn_prior", True)),
        invconv_param=str(arch.get("invconv_param", "plu")),
    )
    tcfg = nft.NFTrainConfig(
        n_bits=int(arch.get("n_bits", 5)),
        compat_fixed_prior=bool(arch.get("fixed_prior", True)),
    )
    params = restore_params(run_dir, "gaussian", epoch)  # host numpy
    temperature = arch.get("temperature")
    if temperature is None:
        temperature = _config_temperature(run_dir)
    return GlowRun(
        gcfg=gcfg, tcfg=tcfg, params=params,
        img_size=int(arch["img_size"]),
        temperature=float(tcfg.temperature if temperature is None
                          else temperature),
        epoch=epoch,
    )


def _diffusion_arch_from_config(run_dir: str) -> Dict[str, Any]:
    """Fallback for runs that predate diffusion_architecture.json: rebuild
    the architecture dict from the run's persisted config.yaml (flow arch
    via the pretrain run's architecture.json, mirroring
    run_diffusion_prior_experiment.py's model assembly)."""
    import yaml

    from ..utils.config import Config

    with open(os.path.join(run_dir, "config.yaml")) as f:
        cfg = Config(yaml.safe_load(f))
    nf_cfg = cfg.model.normalizing_flow
    img_size = int(cfg.data.img_size)
    in_channels = 1 if cfg.data.name == "MNIST" else 3
    if nf_cfg.init_nf.mode == "pretrain":
        # sibling run dir under the same outputs/ root
        pre = os.path.join(os.path.dirname(os.path.abspath(run_dir)),
                           nf_cfg.init_nf.pretrain.dir)
        fa = load_architecture(pre)
        flow = {
            "L": int(fa["L"]), "K": int(fa["K"]),
            "in_channels": int(fa["in_channels"]),
            "coupling_width": int(fa.get("coupling_width", 512)),
            "learn_prior": bool(fa.get("learn_prior", True)),
            "invconv_param": str(fa.get("invconv_param", "plu")),
            "img_size": img_size,
        }
    else:
        sc = nf_cfg.init_nf.scratch
        flow = {
            "L": int(sc.L), "K": int(sc.K), "in_channels": in_channels,
            "coupling_width": int(sc.get("coupling_width", 512)),
            "learn_prior": True, "invconv_param": "plu",
            "img_size": img_size,
        }
    u = cfg.model.unet
    d = cfg.model.diffusion
    return {
        "kind": "diffusion_prior",
        "flow": flow,
        "formater": str(nf_cfg.latent_formater),
        "unet_kwargs": dict(
            dim=int(u.dim), dim_mults=list(u.dim_mults),
            resnet_block_groups=int(u.resnet_block_groups),
            learned_sinusoidal_cond=bool(u.learned_sinusoidal_cond),
            random_fourier_features=bool(u.random_fourier_features),
            learned_sinusoidal_dim=int(u.learned_sinusoidal_dim),
        ),
        "diffusion_kwargs": dict(
            timesteps=int(d.timesteps),
            sampling_timesteps=int(d.sampling_timesteps),
            loss_type=str(d.loss_type), beta_schedule=str(d.beta_schedule),
            ddim_sampling_eta=float(d.ddim_sampling_eta),
            scan_unroll=int(cfg.select("model.diffusion.scan_unroll", 1)),
            sampling_method=str(cfg.select("model.diffusion.sampling_method",
                                           "auto")),
            vlb_time_chunk=int(cfg.select("model.diffusion.vlb_time_chunk",
                                          4)),
        ),
        "frozen": bool(nf_cfg.freeze),
        "n_bits": int(cfg.model.training.n_bits),
        "temperature": float(cfg.model.training.temperature),
    }


def load_diffusion_run(
    run_dir: str, epoch: Optional[int] = None, ddim: Optional[int] = None,
    batch_sharding=None, use_ema: bool = True,
    sampler: Optional[str] = None,
) -> DiffusionRun:
    """`use_ema=True` (default) loads the checkpoint's EMA weights where the
    run tracked them (diffusion_trainer `ema_decay`) — the right weights for
    generation; a no-op for runs without EMA. `sampler` overrides the run's
    sampling_method ('ancestral' | 'ddim' | 'dpm++') — sampler choice is an
    inference-time knob, not a trained property."""
    from ..models.diffusion_prior import DiffusionPrior
    from ..models.formaters import get_formater
    from ..models.nf_backbone import NFBackbone
    from . import diffusion_trainer as dt

    run_dir = resolve_run_dir(run_dir)
    epoch = _require_epoch(run_dir, "diffusion", epoch)
    try:
        arch = load_architecture(run_dir, "diffusion_architecture.json")
    except FileNotFoundError:
        arch = _diffusion_arch_from_config(run_dir)
    fl = arch["flow"]
    gcfg = glow_m.GlowConfig(
        in_channels=int(fl["in_channels"]), levels=int(fl["L"]),
        steps=int(fl["K"]), coupling_width=int(fl["coupling_width"]),
        learn_prior=bool(fl.get("learn_prior", True)),
        invconv_param=str(fl.get("invconv_param", "plu")),
    )
    img_size = int(fl["img_size"])
    frozen = bool(arch.get("frozen", True))
    backbone = NFBackbone(cfg=gcfg, img_size=img_size, frozen=frozen)
    from ..models.formaters import stats_from_json

    formater = get_formater(arch["formater"])(
        L=gcfg.levels, in_channels=gcfg.in_channels, size=img_size,
        # standardization stats (if the run fitted them): the diffusion
        # models live in the standardized space, so every consumer must
        # rebuild the formater with the SAME stats
        stats=stats_from_json(arch.get("formater_stats")))
    dkw = dict(arch["diffusion_kwargs"])
    if ddim is not None:
        dkw["sampling_timesteps"] = ddim
    if sampler is not None:
        dkw["sampling_method"] = sampler
    ukw = dict(arch["unet_kwargs"])
    if "dim_mults" in ukw:
        ukw["dim_mults"] = tuple(ukw["dim_mults"])
    dp = DiffusionPrior(formater=formater, unet_kwargs=ukw,
                        diffusion_kwargs=dkw, batch_sharding=batch_sharding)
    tcfg = dt.DiffusionTrainConfig(
        n_bits=int(arch.get("n_bits", 5)),
        temperature=float(arch.get("temperature", 1.0)),
    )
    params = restore_params(run_dir, "diffusion", epoch,
                            prefer_ema=use_ema)  # host numpy
    return DiffusionRun(
        backbone=backbone, dp=dp, tcfg=tcfg, params=params,
        img_size=img_size, temperature=tcfg.temperature, epoch=epoch,
    )
