"""Integration tests: both experiment CLIs end-to-end on synthetic data —
NF baseline train -> architecture.json + checkpoint -> diffusion-prior
train from the pretrained flow (the reference's two-stage workflow,
README.md:36-343)."""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, monkeypatch_module=None):
    d = tmp_path_factory.mktemp("exp")
    return str(d)


def test_two_stage_workflow(workdir, monkeypatch):
    monkeypatch.chdir(workdir)

    import run_baseline_experiment as base_exp
    import run_diffusion_prior_experiment as diff_exp

    base_exp.main([
        "experiment_name=nf_test",
        "data.name=synthetic",
        "data.synthetic_fallback=true",
        "data.batch_size=8",
        "data.img_size=8",
        "model.architecture.L=2",
        "model.architecture.K=1",
        "model.architecture.coupling_width=16",
        "model.training.epochs=1",
        "model.training.save_checkpoint_freq=1",
        "model.training.print_freq=4",
    ])

    runs = os.listdir(os.path.join(workdir, "outputs"))
    nf_run = [r for r in runs if r.startswith("nf_test")][0]
    ckpt_dir = os.path.join(workdir, "outputs", nf_run, "checkpoints")
    assert os.path.exists(os.path.join(workdir, "outputs", nf_run, "architecture.json"))
    assert any(f.startswith("model_gaussian_") for f in os.listdir(ckpt_dir))

    diff_exp.main([
        "experiment_name=diff_test",
        "data.name=synthetic",
        "data.synthetic_fallback=true",
        "data.batch_size=8",
        "data.img_size=8",
        f"model.normalizing_flow.init_nf.pretrain.dir={nf_run}",
        "model.normalizing_flow.init_nf.pretrain.epoch=1",
        "model.unet.dim=8",
        "model.unet.dim_mults=[1,2]",
        "model.unet.resnet_block_groups=2",
        "model.diffusion.timesteps=8",
        "model.diffusion.sampling_timesteps=4",
        "model.training.epochs=1",
        "model.training.save_checkpoint_freq=1",
    ])

    runs = os.listdir(os.path.join(workdir, "outputs"))
    diff_run = [r for r in runs if r.startswith("diff_test")][0]
    ckpt_dir = os.path.join(workdir, "outputs", diff_run, "checkpoints")
    assert any(f.startswith("model_diffusion_") for f in os.listdir(ckpt_dir))
    # metrics stream was written
    assert os.path.exists(os.path.join(workdir, "outputs", diff_run, "metrics.jsonl"))

    # unfrozen (co-trained flow) leg: the reference's freeze=False + nf lr
    # config (configs/nf_diffusion.yaml:31-33, trainer.py:104-108,143-146)
    diff_exp.main([
        "experiment_name=diff_unfrozen",
        "data.name=synthetic",
        "data.synthetic_fallback=true",
        "data.batch_size=8",
        "data.img_size=8",
        f"model.normalizing_flow.init_nf.pretrain.dir={nf_run}",
        "model.normalizing_flow.init_nf.pretrain.epoch=1",
        "model.normalizing_flow.freeze=false",
        "model.normalizing_flow.lr=1e-4",
        "model.unet.dim=8",
        "model.unet.dim_mults=[1,2]",
        "model.unet.resnet_block_groups=2",
        "model.diffusion.timesteps=8",
        "model.diffusion.sampling_timesteps=4",
        "model.training.epochs=1",
        "model.training.save_checkpoint_freq=1",
    ])
    runs = os.listdir(os.path.join(workdir, "outputs"))
    unf_run = [r for r in runs if r.startswith("diff_unfrozen")][0]
    unf_dir = os.path.join(workdir, "outputs", unf_run)
    # the tracked loss is the co-training objective (l2 + 0.5*flow BPD)
    with open(os.path.join(unf_dir, "metrics.jsonl")) as f:
        assert "_plus_bpd" in f.read()
    assert any(f.startswith("model_diffusion_")
               for f in os.listdir(os.path.join(unf_dir, "checkpoints")))

    # eval phase on the stored NF checkpoint (run_baseline_experiment.py:104-151)
    base_exp.main([
        "experiment_name=nf_eval",
        "phase=eval",
        f"load.load_exp_dir={nf_run}",
        "load.load_epoch=1",
        "data.name=synthetic",
        "data.synthetic_fallback=true",
        "data.batch_size=8",
        "data.img_size=8",
        "model.architecture.L=2",
        "model.architecture.K=1",
        "model.architecture.coupling_width=16",
    ])

    # eval phase on the stored diffusion checkpoint
    diff_exp.main([
        "experiment_name=diff_eval",
        "phase=eval",
        f"load.load_exp_dir={diff_run}",
        "load.load_epoch=1",
        "data.name=synthetic",
        "data.synthetic_fallback=true",
        "data.batch_size=8",
        "data.img_size=8",
        f"model.normalizing_flow.init_nf.pretrain.dir={nf_run}",
        "model.normalizing_flow.init_nf.pretrain.epoch=1",
        "model.unet.dim=8",
        "model.unet.dim_mults=[1,2]",
        "model.unet.resnet_block_groups=2",
        "model.diffusion.timesteps=8",
        "model.diffusion.sampling_timesteps=4",
    ])

    # standalone generation tool on BOTH run kinds (tools/generate_samples.py)
    import numpy as np

    from tools.generate_samples import main as gen_main

    gen_main(["--run-dir", os.path.join(workdir, "outputs", nf_run),
              "--n", "12", "--batch", "8", "--seed", "3"])
    gen_dir = os.path.join(workdir, "outputs", nf_run, "generated")
    nf_samples = np.load(os.path.join(gen_dir, "samples.npz"))["samples"]
    assert nf_samples.shape == (12, 8, 8, 3) and nf_samples.dtype == np.uint8
    assert os.path.exists(os.path.join(gen_dir, "grid.png"))

    assert os.path.exists(os.path.join(
        workdir, "outputs", diff_run, "diffusion_architecture.json"))
    # diffusion run, sharded over the 8-device virtual mesh (n=9 also
    # exercises the non-divisible final shard via the sharding constraint)
    gen_main(["--run-dir", os.path.join(workdir, "outputs", diff_run),
              "--n", "9", "--batch", "8", "--ddim", "2", "--data-parallel"])
    d_dir = os.path.join(workdir, "outputs", diff_run, "generated")
    d_samples = np.load(os.path.join(d_dir, "samples.npz"))["samples"]
    assert d_samples.shape == (9, 8, 8, 3) and d_samples.dtype == np.uint8

    # legacy diffusion runs (no diffusion_architecture.json) reconstruct
    # the architecture from config.yaml + the pretrain run's architecture
    arch_json = os.path.join(workdir, "outputs", diff_run,
                             "diffusion_architecture.json")
    os.rename(arch_json, arch_json + ".bak")
    try:
        gen_main(["--run-dir", os.path.join(workdir, "outputs", diff_run),
                  "--n", "4", "--batch", "8", "--ddim", "2",
                  "--out", os.path.join(workdir, "legacy_gen")])
        legacy = np.load(os.path.join(workdir, "legacy_gen", "samples.npz"))
        assert legacy["samples"].shape == (4, 8, 8, 3)
    finally:
        os.rename(arch_json + ".bak", arch_json)

    # interpolation strips on BOTH run kinds (tools/interpolate.py)
    from tools.interpolate import main as interp_main

    for run, n_lam in ((nf_run, 4), (diff_run, 3)):
        interp_main(["--run-dir", os.path.join(workdir, "outputs", run),
                     "--idx", "0", "2", "--steps", str(n_lam)])
        strip = np.load(os.path.join(
            workdir, "outputs", run, "interpolations", "interp_0_2.npz"))
        # raw endpoints + n_lam interpolants
        assert strip["strip"].shape == (n_lam + 2, 8, 8, 3)
        assert strip["strip"].dtype == np.uint8
        assert strip["lams"].shape == (n_lam,)
    # Glow run: lambda=0/1 reconstruct the endpoints up to 5-bit
    # re-quantization (-0..7) plus one floor-boundary flip (-8): the
    # roundtripped code (y+0.5)*32 is exactly integral, so the tiny flow
    # roundtrip error (~1e-6) flips the floor down on ~half the pixels.
    # Per-pixel bound 15, expected mean 3.5 + 8*P(flip) <= 7.5.
    g = np.load(os.path.join(workdir, "outputs", nf_run,
                             "interpolations", "interp_0_2.npz"))["strip"]
    assert np.all(np.abs(g[1].astype(int) - g[0].astype(int)) <= 15)
    assert np.all(np.abs(g[-2].astype(int) - g[-1].astype(int)) <= 15)
    assert np.mean(np.abs(g[1].astype(int) - g[0].astype(int))) < 8.5


def test_standardized_bf16_stage2(workdir, monkeypatch):
    """Round-4 knobs through the full CLI: latent standardization
    (stats fitted, persisted in diffusion_architecture.json, reloaded by
    the eval phase AND by runload) and the bf16 UNet
    (model.diffusion.unet_dtype travels as a string)."""
    import json

    monkeypatch.chdir(workdir)

    import run_diffusion_prior_experiment as diff_exp

    runs = os.listdir(os.path.join(workdir, "outputs"))
    nf_run = [r for r in runs if r.startswith("nf_test")][0]
    common = [
        "data.name=synthetic", "data.synthetic_fallback=true",
        "data.batch_size=8", "data.img_size=8",
        f"model.normalizing_flow.init_nf.pretrain.dir={nf_run}",
        "model.normalizing_flow.init_nf.pretrain.epoch=1",
        "model.normalizing_flow.standardize_latents=true",
        "model.normalizing_flow.standardize_batches=2",
        "model.diffusion.unet_dtype=bfloat16",
        "model.unet.dim=8", "model.unet.dim_mults=[1,2]",
        "model.unet.resnet_block_groups=2",
        "model.diffusion.timesteps=8", "model.diffusion.sampling_timesteps=4",
    ]
    diff_exp.main(["experiment_name=diff_std", "model.training.epochs=1",
                   "model.training.save_checkpoint_freq=1"] + common)

    runs = os.listdir(os.path.join(workdir, "outputs"))
    std_run = [r for r in runs if r.startswith("diff_std")][0]
    arch_path = os.path.join(workdir, "outputs", std_run,
                             "diffusion_architecture.json")
    with open(arch_path) as f:
        arch = json.load(f)
    assert arch["unet_kwargs"]["dtype"] == "bfloat16"
    stats = arch["formater_stats"]
    assert stats and len(stats) > 0
    for mean, std in stats:
        assert len(mean) == len(std) and all(s > 0 for s in std)

    # eval phase reloads the persisted stats (not a refit) and runs
    diff_exp.main(["experiment_name=diff_std_eval", "phase=eval",
                   f"load.load_exp_dir={std_run}", "load.load_epoch=1"]
                  + common)

    # runload rebuilds the formater with the same stats and bf16 UNet
    from nfdpm_tpu.training.runload import load_diffusion_run

    run = load_diffusion_run(os.path.join(workdir, "outputs", std_run))
    assert run.dp.formater.stats is not None
    got = [[list(m), list(s)] for m, s in run.dp.formater.stats]
    assert got == stats
    assert run.dp.formater.stats_log_sigma_total() != 0.0


def test_sweep_tool(workdir, monkeypatch):
    """tools/sweep.py: two tiny baseline runs from one spec, combined
    summary with per-run final metrics and a comparison report."""
    import json

    monkeypatch.chdir(workdir)
    from tools.sweep import main as sweep_main

    spec = {
        "entry": "baseline",
        "base": [
            "data.name=synthetic", "data.synthetic_fallback=true",
            "data.batch_size=8", "data.img_size=8", "data.synthetic_n=32",
            "model.architecture.L=2", "model.architecture.K=1",
            "model.architecture.coupling_width=16",
            "model.training.epochs=1", "model.training.print_freq=4",
            "model.training.save_checkpoint_freq=5",
        ],
        "runs": [
            ["experiment_name=sweep_a", "seed=1"],
            ["experiment_name=sweep_b", "seed=2"],
        ],
    }
    spec_path = os.path.join(workdir, "sweep.yaml")
    import yaml

    with open(spec_path, "w") as f:
        yaml.safe_dump(spec, f)

    sweep_main([spec_path, "--out", os.path.join(workdir, "sweep_out")])
    summary = json.load(open(os.path.join(workdir, "sweep_out",
                                          "sweep_summary.json")))
    assert len(summary["rows"]) == 2
    key = "bpd[final=True,subset=test]"
    for row in summary["rows"]:
        assert row["run_dir"] and key in row["final"]
    # the two seeds produced different runs
    assert (summary["rows"][0]["final"][key]
            != summary["rows"][1]["final"][key])
    doc = open(os.path.join(workdir, "sweep_out", "report.html")).read()
    assert "sweep_a" in doc and "sweep_b" in doc
