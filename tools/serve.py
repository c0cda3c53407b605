#!/usr/bin/env python
"""Generation server: keep a compiled sampler warm, serve samples over HTTP.

The reference has no serving story at all — every generation pays model
construction (and on a tunneled TPU backend, minutes of XLA compilation)
per process. This server loads a finished run once (either kind, via
nfdpm_tpu.training.runload), jits + warms the sampler at startup, then
answers generation requests from the resident executable:

    python tools/serve.py --run-dir <run> --batch 64 --port 8400
    curl localhost:8400/health
    curl -X POST localhost:8400/generate -d '{"n": 16, "seed": 7}' -o out.npz
    curl -X POST localhost:8400/generate \
         -d '{"n": 64, "format": "png"}' -o grid.png

POST /generate body (JSON): n (required), temperature (default: the
run's), seed (default 0), format: "npz" (uint8 NHWC under key 'samples',
default) or "png" (8-wide grid). The sampler runs at the fixed compiled
batch size (--batch); requests are served in chunks under a lock (JAX
dispatch is single-stream here by design).
"""

import argparse
import io
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_sampler(args):
    """(sample_images(n, temperature, seed) -> uint8 NHWC, info dict)."""
    import jax

    from nfdpm_tpu.training.runload import detect_kind, resolve_run_dir
    from nfdpm_tpu.utils.env import enable_compilation_cache
    from tools.generate_samples import (_build_diffusion, _build_glow,
                                        generate_batched)

    enable_compilation_cache()
    run_dir = resolve_run_dir(args.run_dir)
    kind, newest = detect_kind(run_dir)
    epoch = args.epoch if args.epoch is not None else newest

    mesh = None
    if args.data_parallel:
        from nfdpm_tpu.parallel import mesh as mesh_m

        mesh = mesh_m.make_mesh()
    if kind == "diffusion":
        sample_fn, params, run_temp, epoch = _build_diffusion(
            run_dir, epoch, args.ddim, mesh=mesh,
            use_ema=not getattr(args, "no_ema", False),
            sampler=getattr(args, "sampler", None))
    else:
        sample_fn, params, run_temp, epoch = _build_glow(
            run_dir, epoch, mesh=mesh)

    batch = args.batch
    lock = threading.Lock()

    def sample_images(n, temperature, seed):
        with lock:  # one compiled executable, one dispatch stream
            return generate_batched(sample_fn, params, n, batch,
                                    temperature, seed)

    info = {"run_dir": run_dir, "kind": kind, "epoch": int(epoch),
            "batch": batch, "temperature": float(run_temp),
            "devices": jax.device_count() if args.data_parallel else 1}

    t0 = time.perf_counter()
    sample_images(min(2, batch), run_temp, 0)  # compile + warm
    info["warmup_seconds"] = round(time.perf_counter() - t0, 2)
    return sample_images, info


def make_handler(sample_images, info):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, json.dumps(
                    {"status": "ok", **info}).encode())
            else:
                self._send(404, b'{"error": "unknown path"}')

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, b'{"error": "unknown path"}')
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("body must be a JSON object")
                n = int(req["n"])
                if n < 1 or n > 1_000_000:
                    raise ValueError("n out of range")
                temperature = float(req.get("temperature",
                                            info["temperature"]))
                seed = int(req.get("seed", 0))
                fmt = req.get("format", "npz")
                if fmt == "png":
                    n = min(n, 64)  # the grid shows 64; don't generate more
            except (KeyError, ValueError, TypeError,
                    json.JSONDecodeError) as e:
                self._send(400, json.dumps({"error": str(e)}).encode())
                return
            import numpy as np

            t0 = time.perf_counter()
            samples = sample_images(n, temperature, seed)
            dt = time.perf_counter() - t0
            buf = io.BytesIO()
            if fmt == "png":
                from nfdpm_tpu.training.tracking import save_image_grid

                import tempfile

                with tempfile.NamedTemporaryFile(suffix=".png") as f:
                    save_image_grid(samples[:64], f.name)
                    buf.write(open(f.name, "rb").read())
                ctype = "image/png"
            else:
                np.savez_compressed(buf, samples=samples)
                ctype = "application/octet-stream"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("X-Generation-Seconds", f"{dt:.3f}")
            self.send_header("X-Samples-Per-Sec", f"{len(samples) / dt:.1f}")
            body = buf.getvalue()
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):  # route to stdout, one line
            print(f"[serve] {self.address_string()} {fmt % a}", flush=True)

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--batch", type=int, default=64,
                    help="compiled sampler batch size")
    ap.add_argument("--no-ema", action="store_true",
                    help="diffusion runs: serve the live weights instead of "
                         "the EMA shadow")
    ap.add_argument("--ddim", type=int, default=None,
                    help="diffusion runs: sampling_timesteps override")
    ap.add_argument("--sampler", default=None,
                    choices=["auto", "ancestral", "ddim", "dpm++"],
                    help="diffusion runs: sampler override (dpm++ pairs "
                         "well with --ddim 25)")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard generation over all local devices")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8400)
    args = ap.parse_args(argv)

    sample_images, info = build_sampler(args)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(sample_images, info))
    print(json.dumps({"serving": f"http://{args.host}:{server.server_port}",
                      **info}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
