"""Utils tests: config system (YAML + dotted overrides + run dirs),
parse_metric, tracking (scalars, images, histograms), profiling timer."""

import json
import os

import numpy as np
import pytest
import yaml

from nfdpm_tpu.utils.config import Config, load_config, make_run_dir, parse_metric


@pytest.fixture()
def cfg_file(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({
        "experiment_name": "t",
        "data": {"name": "MNIST", "batch_size": 64, "digits": None},
        "model": {"architecture": {"L": 3, "K": 4},
                  "optimizer": {"lr": 1e-3}},
    }))
    return str(p)


class TestConfig:
    def test_dotted_overrides(self, cfg_file):
        cfg = load_config(cfg_file, [
            "data.name=cifar10", "model.architecture.L=5",
            "model.optimizer.lr=5e-4", "data.digits=[0,1]",
            "data.transformations=[RandomHorizontalFlip]",
        ])
        assert cfg.data.name == "cifar10"
        assert cfg.model.architecture.L == 5
        assert cfg.model.optimizer.lr == 5e-4
        assert cfg.data.digits == [0, 1]
        assert cfg.data.transformations == ["RandomHorizontalFlip"]

    def test_select_with_default(self, cfg_file):
        cfg = load_config(cfg_file)
        assert cfg.select("model.architecture.K") == 4
        assert cfg.select("nope.nope", 7) == 7

    def test_attribute_access_nested(self, cfg_file):
        cfg = load_config(cfg_file)
        assert isinstance(cfg.model.architecture, Config)
        with pytest.raises(AttributeError):
            _ = cfg.missing_key

    def test_run_dir_templating(self, cfg_file, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = load_config(cfg_file)
        rd = make_run_dir(cfg)
        assert os.path.basename(rd).startswith("t_")
        assert os.path.exists(os.path.join(rd, "config.yaml"))
        assert os.path.isdir(os.path.join(rd, "checkpoints"))

    def test_parse_metric_zip(self):
        out = parse_metric({"mode": ["clean", "legacy_tensorflow"],
                            "model_name": ["inception_v3", "clip_vit_b_32"]})
        assert out == [
            {"mode": "clean", "model_name": "inception_v3"},
            {"mode": "legacy_tensorflow", "model_name": "clip_vit_b_32"},
        ]
        assert parse_metric(None) == []
        assert parse_metric({"mode": [], "model_name": []}) == []


class TestTracking:
    def test_scalars_and_histograms(self, tmp_path):
        from nfdpm_tpu.training.tracking import Tracker

        t = Tracker(str(tmp_path))
        t.track(1.5, "loss", step=1, epoch=1, context={"subset": "train"})
        t.track_param_distributions({"w": np.random.default_rng(0).normal(size=100)})
        t.close()
        recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert recs[0]["name"] == "loss" and recs[0]["value"] == 1.5
        hist = [r for r in recs if r["name"].startswith("param_dist/")][0]
        assert sum(hist["value"]["counts"]) == 100

    def test_tensorboard_sink(self, tmp_path, monkeypatch):
        """Scalars/images/histograms mirror into a live TensorBoard event
        stream under <run_dir>/tb (the reference's `aim up` dashboard
        parity, README.md:347-352); NFDPM_NO_TENSORBOARD=1 opts out."""
        pytest.importorskip("tensorboardX")
        from nfdpm_tpu.training.tracking import Tracker

        t = Tracker(str(tmp_path))
        assert t._tb is not None
        t.track(1.5, "bpd", step=1, context={"subset": "train"})
        t.track_images(
            np.zeros((4, 8, 8, 1), np.uint8), "generated", step=1, epoch=1)
        t.track_param_distributions(
            {"w": np.random.default_rng(0).normal(size=64)}, step=1)
        t.close()
        events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
        assert events and events[0].stat().st_size > 0

        monkeypatch.setenv("NFDPM_NO_TENSORBOARD", "1")
        t2 = Tracker(str(tmp_path / "no_tb"))
        assert t2._tb is None
        t2.close()

    def test_image_grid(self, tmp_path):
        from nfdpm_tpu.training.tracking import save_image_grid

        imgs = np.random.default_rng(0).integers(0, 256, (10, 8, 8, 3)).astype(np.uint8)
        path = str(tmp_path / "g.png")
        save_image_grid(imgs, path)
        from PIL import Image

        g = Image.open(path)
        assert g.size[0] > 8 and g.size[1] > 8


class TestWatchdog:
    def test_fires_dumps_stacks(self, tmp_path):
        """No heartbeat within timeout -> fired + all-thread stack dump in
        <run_dir>/watchdog_stall.txt (observe-only action)."""
        import time

        from nfdpm_tpu.utils.watchdog import StepWatchdog

        wd = StepWatchdog(0.1, run_dir=str(tmp_path), action="log",
                          poll_s=0.02)
        with wd:
            wd.beat_sync()
            time.sleep(0.5)
        assert wd.fired
        dump = open(tmp_path / "watchdog_stall.txt").read()
        assert "no step heartbeat" in dump and "Thread" in dump

    def test_first_sync_grace(self, tmp_path):
        """Until the first SYNCHRONIZING beat the allowance is 10x the
        timeout (async dispatch means early beats don't prove completion;
        the first metric fetch blocks on XLA compilation). Plain `beat()`
        refreshes the clock but does NOT end the grace window; `beat_sync()`
        does."""
        import time

        from nfdpm_tpu.utils.watchdog import StepWatchdog

        wd = StepWatchdog(0.15, run_dir=str(tmp_path), action="log",
                          poll_s=0.02)
        with wd:
            wd.beat()                 # dispatch-only: grace stays active
            time.sleep(0.45)          # 3x timeout, pre-sync: no fire
            assert not wd.fired
            wd.beat_sync()
            time.sleep(0.45)
        assert wd.fired

    def test_interrupt_action_reaches_main_thread(self, tmp_path):
        """action="interrupt" lands a KeyboardInterrupt in the main thread —
        the trainers' emergency-checkpoint path."""
        import time

        from nfdpm_tpu.utils.watchdog import StepWatchdog

        with pytest.raises(KeyboardInterrupt):
            with StepWatchdog(0.1, run_dir=str(tmp_path), poll_s=0.02) as wd:
                wd.beat_sync()
                for _ in range(200):  # interrupt is delivered at a bytecode
                    time.sleep(0.05)  # boundary between these sleeps
        assert wd.fired

    def test_disabled_is_noop(self):
        from nfdpm_tpu.utils.watchdog import StepWatchdog

        wd = StepWatchdog(None)
        with wd:
            wd.beat()
        assert wd._thread is None and not wd.fired


class TestProfiling:
    def test_step_timer_summary(self):
        import time

        from nfdpm_tpu.utils.profiling import StepTimer

        t = StepTimer()
        for _ in range(5):
            with t.step():
                time.sleep(0.001)
        s = t.summary()
        assert s["steps"] == 4  # warmup skipped
        assert s["p50_ms"] >= 1.0


class TestEpochProfiler:
    def test_traces_one_epoch_into_tb_layout(self, tmp_path):
        """EpochProfiler captures exactly its target epoch and writes the
        jax.profiler layout (plugins/profile/<ts>/*.xplane.pb) under the
        run's tb/ dir, where TensorBoard's Profile tab finds it."""
        import jax
        import jax.numpy as jnp

        from nfdpm_tpu.utils.profiling import EpochProfiler

        f = jax.jit(lambda x: x * 2 + 1)
        p = EpochProfiler(str(tmp_path / "tb"), profile_epoch=2, max_steps=3)
        for epoch in (1, 2, 3):
            p.start_epoch(epoch)
            for _ in range(5):
                f(jnp.ones(8)).block_until_ready()
                p.step()
            p.end_epoch()
        traces = list((tmp_path / "tb").glob("plugins/profile/*/*.xplane.pb"))
        assert len(traces) == 1 and traces[0].stat().st_size > 0

    def test_disabled_writes_nothing(self, tmp_path):
        from nfdpm_tpu.utils.profiling import EpochProfiler

        p = EpochProfiler(str(tmp_path / "tb"), profile_epoch=None)
        p.start_epoch(1)
        p.step()
        p.end_epoch()
        assert not (tmp_path / "tb").exists()


class TestHTMLReport:
    def test_report_from_run_dirs(self, tmp_path):
        """tools/report.py: the aim-up substitute renders two tracked run
        dirs into one self-contained HTML (charts, grids, config blocks)."""
        from nfdpm_tpu.training.tracking import Tracker, save_image_grid
        from tools.report import main as report_main

        rng = np.random.default_rng(0)
        for name, vals in (("run_a", [3.0, 2.5, 2.2]), ("run_b", [2.9, 2.6])):
            rd = tmp_path / name
            t = Tracker(str(rd))
            for i, v in enumerate(vals):
                t.track(v, "bpd", step=i, context={"subset": "test"})
            t.close()
            (rd / "results").mkdir()
            save_image_grid(
                rng.integers(0, 256, (4, 8, 8, 3)).astype(np.uint8),
                str(rd / "results" / "samples.png"))
            with open(rd / "config.yaml", "w") as f:
                f.write("data:\n  name: synthetic\n")

        out = str(tmp_path / "report.html")
        report_main([str(tmp_path / "run_a"), str(tmp_path / "run_b"),
                     "--out", out])
        doc = open(out).read()
        assert doc.count("class='chart'") == 1      # both runs on one chart
        assert doc.count("class='grid'") == 2       # one grid per run
        assert "bpd[subset=test]" in doc and "config.yaml" in doc
        assert "data:image/png;base64," in doc


class TestCompilationCache:
    def test_respects_existing_config_and_optout(self, monkeypatch):
        import jax

        from nfdpm_tpu.utils.env import enable_compilation_cache

        # conftest already configured the suite cache — the helper must
        # return it unchanged, NOT clobber it with the default location
        before = jax.config.jax_compilation_cache_dir
        assert before  # set by conftest
        assert enable_compilation_cache("/tmp/should_not_be_used") == before
        assert jax.config.jax_compilation_cache_dir == before

        monkeypatch.setenv("NFDPM_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache() is None

    def test_platform_env_no_flip_after_backends_live(self, monkeypatch):
        """Regression (round 3): honor_platform_env must NOT flip
        jax_platforms once backends are instantiated — an in-process CLI
        call (test_entry_points) would otherwise move every subsequent
        compile in this process onto the ambient JAX_PLATFORMS platform
        (the real TPU on this box), silently breaking tight-precision CPU
        tests that run after it."""
        import jax

        from nfdpm_tpu.utils.env import honor_platform_env

        import jax.numpy as jnp

        float(jnp.zeros(()))  # ensure the cpu backend is instantiated
        before = jax.config.jax_platforms
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        honor_platform_env()
        assert jax.config.jax_platforms == before

    def test_report_label_dedup(self, tmp_path):
        """Two run dirs sharing a basename get parent-qualified labels."""
        from tools.report import run_labels

        (tmp_path / "outputs" / "exp").mkdir(parents=True)
        (tmp_path / "backup" / "exp").mkdir(parents=True)
        labels = run_labels([str(tmp_path / "outputs" / "exp"),
                             str(tmp_path / "backup" / "exp")])
        assert labels == ["outputs/exp", "backup/exp"]
