#!/usr/bin/env python
"""Self-contained HTML report for one or more run dirs.

The reference's observability story is an Aim dashboard (`aim up`,
/root/reference/README.md:347-352; trainer tracks scalars/images/texts via
aim.Run — normalizing_flow/trainer.py:127-130). Aim isn't available here,
and a live server is the wrong shape for batch TPU jobs anyway — this tool
renders the same channels (metric curves with subset contexts, generated
sample grids, config, final stats) into ONE portable HTML file you can scp
out of a pod and open anywhere.

    python tools/report.py outputs/run_a outputs/run_b --out report.html
    python tools/report.py 'outputs/glow_*'            # globs ok

Multiple runs overlay on the same metric charts (Aim's compare view).
"""

import argparse
import base64
import glob
import html
import io
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_stream(run_dir):
    path = os.path.join(run_dir, "metrics.jsonl")
    recs = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    recs.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return recs


def series_key(rec):
    """Metric identity: name plus the context values (e.g. subset=train)."""
    ctx = rec.get("context") or {}
    suffix = ",".join(f"{k}={v}" for k, v in sorted(ctx.items()))
    return f"{rec['name']}[{suffix}]" if suffix else rec["name"]


def run_labels(run_dirs):
    """Unique display label per run dir: basename, disambiguated with the
    parent dir when two runs share a basename (e.g. outputs/x vs backup/x)."""
    bases = [os.path.basename(rd.rstrip("/")) for rd in run_dirs]
    labels = []
    for rd, base in zip(run_dirs, bases):
        if bases.count(base) > 1:
            parent = os.path.basename(os.path.dirname(
                os.path.abspath(rd.rstrip("/"))))
            labels.append(f"{parent}/{base}")
        else:
            labels.append(base)
    return labels


def collect_series(run_dirs):
    """{metric_key: {run_label: [(x, value), ...]}} for scalar records."""
    out = defaultdict(dict)
    for rd, label in zip(run_dirs, run_labels(run_dirs)):
        per_key = defaultdict(list)
        for i, rec in enumerate(load_stream(rd)):
            v = rec.get("value")
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                continue
            x = rec.get("step")
            if x is None:
                x = rec.get("epoch")
            per_key[series_key(rec)].append((x if x is not None else i, v))
        for k, pts in per_key.items():
            out[k][label] = sorted(pts)
    return out


def chart_png_b64(title, runs):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 3.2))
    for label, pts in runs.items():
        xs, ys = zip(*pts)
        if len(pts) == 1:
            ax.plot(xs, ys, "o", label=label)
        else:
            ax.plot(xs, ys, label=label, linewidth=1.2)
    ax.set_title(title, fontsize=10)
    ax.set_xlabel("step", fontsize=8)
    ax.grid(alpha=0.3)
    ax.tick_params(labelsize=8)
    if len(runs) > 1:
        ax.legend(fontsize=7)
    fig.tight_layout()
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110)
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


def img_b64(path):
    with open(path, "rb") as f:
        return base64.b64encode(f.read()).decode()


def run_images(run_dir, max_images):
    """Newest PNGs from results/ and generated/ (sample grids)."""
    paths = []
    for sub in ("results", "generated", "interpolations"):
        paths.extend(glob.glob(os.path.join(run_dir, sub, "*.png")))
    paths.sort(key=os.path.getmtime, reverse=True)
    return paths[:max_images]


def text_block(title, body):
    return (f"<details><summary>{html.escape(title)}</summary>"
            f"<pre>{html.escape(body)}</pre></details>")


def build_html(run_dirs, max_images):
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        "<title>nfdpm_tpu run report</title><style>",
        "body{font-family:system-ui,sans-serif;margin:24px;max-width:1100px}",
        "h2{border-bottom:1px solid #ddd;padding-bottom:4px}",
        "img.chart{display:block;margin:8px 0}",
        "img.grid{image-rendering:pixelated;margin:4px;border:1px solid #ccc}",
        "table{border-collapse:collapse}td,th{border:1px solid #ccc;",
        "padding:3px 8px;font-size:13px}pre{background:#f6f6f6;padding:8px;",
        "overflow-x:auto;font-size:12px}summary{cursor:pointer;margin:6px 0}",
        "</style></head><body>",
        f"<h1>nfdpm_tpu report — {len(run_dirs)} run(s)</h1>",
    ]

    # final-value summary table (last record per metric per run)
    series = collect_series(run_dirs)
    labels = run_labels(run_dirs)
    parts.append("<h2>Final values</h2><table><tr><th>metric</th>")
    parts.extend(f"<th>{html.escape(l)}</th>" for l in labels)
    parts.append("</tr>")
    for key in sorted(series):
        parts.append(f"<tr><td>{html.escape(key)}</td>")
        for l in labels:
            pts = series[key].get(l)
            parts.append(f"<td>{pts[-1][1]:.5g}</td>" if pts else "<td>—</td>")
        parts.append("</tr>")
    parts.append("</table>")

    parts.append("<h2>Metric curves</h2>")
    for key in sorted(series):
        parts.append(f"<img class='chart' alt='{html.escape(key)}' "
                     f"src='data:image/png;base64,"
                     f"{chart_png_b64(key, series[key])}'>")

    for rd, label in zip(run_dirs, run_labels(run_dirs)):
        parts.append(f"<h2>{html.escape(label)}</h2>")
        imgs = run_images(rd, max_images)
        if imgs:
            parts.append("<div>")
            for p in imgs:
                parts.append(
                    f"<img class='grid' title='{html.escape(os.path.basename(p))}' "
                    f"src='data:image/png;base64,{img_b64(p)}'>")
            parts.append("</div>")
        for fname in ("config.yaml", "architecture.json",
                      "diffusion_architecture.json"):
            p = os.path.join(rd, fname)
            if os.path.exists(p):
                with open(p) as f:
                    parts.append(text_block(fname, f.read()))

    parts.append("</body></html>")
    return "".join(parts)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("runs", nargs="+", help="run dirs (globs ok)")
    ap.add_argument("--out", default=None,
                    help="output path (default: <first run>/report.html)")
    ap.add_argument("--max-images", type=int, default=8,
                    help="newest sample grids per run to embed")
    args = ap.parse_args(argv)

    run_dirs = []
    for r in args.runs:
        hits = sorted(glob.glob(r)) or [r]
        run_dirs.extend(h for h in hits if os.path.isdir(h))
    if not run_dirs:
        raise SystemExit(f"no run dirs matched {args.runs}")

    out = args.out or os.path.join(run_dirs[0], "report.html")
    doc = build_html(run_dirs, args.max_images)
    with open(out, "w") as f:
        f.write(doc)
    print(json.dumps({"report": out, "runs": len(run_dirs),
                      "bytes": len(doc)}))


if __name__ == "__main__":
    main()
