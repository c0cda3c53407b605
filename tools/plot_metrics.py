#!/usr/bin/env python
"""Plot metrics.jsonl streams from run dirs (the `aim up` dashboard
substitute, SURVEY.md §5.5).

    python tools/plot_metrics.py outputs/glow_MNIST_*/ --name bpd --out bpd.png
    python tools/plot_metrics.py outputs/run --list
"""

import argparse
import glob
import json
import os
import sys


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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+", help="run dirs (globs ok)")
    p.add_argument("--name", default="bpd")
    p.add_argument("--list", action="store_true", help="list metric names")
    p.add_argument("--out", default=None, help="PNG path (default: stdout table)")
    args = p.parse_args()

    run_dirs = []
    for r in args.runs:
        run_dirs.extend(sorted(glob.glob(r)))

    if args.list:
        for rd in run_dirs:
            names = sorted({x["name"] for x in load_stream(rd)})
            print(f"{rd}: {', '.join(names)}")
        return

    series = {}
    for rd in run_dirs:
        pts = [(x.get("step") or 0, x["value"]) for x in load_stream(rd)
               if x["name"] == args.name and isinstance(x["value"], (int, float))]
        if pts:
            series[os.path.basename(rd.rstrip("/"))] = sorted(pts)

    if not series:
        print(f"no '{args.name}' records found", file=sys.stderr)
        sys.exit(1)

    if args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4.5))
        for label, pts in series.items():
            xs, ys = zip(*pts)
            ax.plot(xs, ys, label=label)
        ax.set_xlabel("step")
        ax.set_ylabel(args.name)
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    else:
        for label, pts in series.items():
            last = pts[-1]
            best = min(pts, key=lambda t: t[1])
            print(f"{label}: n={len(pts)} last={last[1]:.4f}@{last[0]} "
                  f"best={best[1]:.4f}@{best[0]}")


if __name__ == "__main__":
    main()
