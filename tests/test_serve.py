"""Generation server (tools/serve.py): warm-sampler HTTP serving over a
fabricated Glow run dir (init params checkpointed directly — no training
needed to exercise the serving path)."""

import http.client
import io
import json
import threading

import jax.numpy as jnp
import numpy as np

from nfdpm_tpu.models import glow as glow_m
from nfdpm_tpu.training import nf_trainer as nft
from nfdpm_tpu.training.checkpoint import save_architecture, save_state
from nfdpm_tpu.training.optim import make_optimizer


def _make_run_dir(tmp_path):
    cfg = glow_m.GlowConfig(in_channels=3, levels=2, steps=1,
                            coupling_width=16)
    tcfg = nft.NFTrainConfig()
    tx = make_optimizer("adam", 1e-3, fixed_prior=tcfg.compat_fixed_prior)
    state = nft.init_train_state(0, cfg, tcfg, tx)
    save_state(str(tmp_path), "gaussian", 1, state)
    save_architecture(str(tmp_path), {
        "L": 2, "K": 1, "in_channels": 3, "img_size": 8,
        "coupling_width": 16, "learn_prior": True, "n_bits": 5,
        "fixed_prior": True, "temperature": 0.7, "optimizer": "adam",
        "invconv_param": "plu",
    })
    return str(tmp_path)


def test_serve_health_generate_and_errors(tmp_path):
    from http.server import ThreadingHTTPServer

    from tools.serve import build_sampler, make_handler

    run_dir = _make_run_dir(tmp_path)

    class Args:
        pass

    args = Args()
    args.run_dir = run_dir
    args.epoch = None
    args.batch = 8
    args.ddim = None
    args.data_parallel = False

    sample_images, info = build_sampler(args)
    assert info["kind"] == "gaussian" and info["temperature"] == 0.7
    assert info["warmup_seconds"] >= 0

    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(sample_images, info))
    port = server.server_port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

        conn.request("GET", "/health")
        r = conn.getresponse()
        health = json.loads(r.read())
        assert r.status == 200 and health["status"] == "ok"
        assert health["epoch"] == 1

        # npz generation, n not divisible by the compiled batch
        conn.request("POST", "/generate",
                     body=json.dumps({"n": 11, "seed": 3}))
        r = conn.getresponse()
        assert r.status == 200
        assert float(r.headers["X-Samples-Per-Sec"]) > 0
        data = np.load(io.BytesIO(r.read()))
        assert data["samples"].shape == (11, 8, 8, 3)
        assert data["samples"].dtype == np.uint8

        # identical seeds give identical samples (stateless serving)
        conn.request("POST", "/generate",
                     body=json.dumps({"n": 11, "seed": 3}))
        again = np.load(io.BytesIO(conn.getresponse().read()))
        np.testing.assert_array_equal(again["samples"], data["samples"])

        # png grid
        conn.request("POST", "/generate",
                     body=json.dumps({"n": 4, "format": "png"}))
        r = conn.getresponse()
        assert r.status == 200 and r.headers["Content-Type"] == "image/png"
        assert r.read()[:4] == b"\x89PNG"

        # malformed requests -> 400, unknown path -> 404 (drain each body
        # so the keep-alive connection can be reused)
        for method, path, body, code in (
            ("POST", "/generate", b"{}", 400),
            ("POST", "/generate", json.dumps({"n": 0}), 400),
            ("GET", "/nope", None, 404),
        ):
            conn.request(method, path, body=body)
            r = conn.getresponse()
            r.read()
            assert r.status == code, (path, r.status)
    finally:
        server.shutdown()
