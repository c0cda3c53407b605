#!/usr/bin/env python
"""Sequential experiment sweeps with a combined summary + HTML report.

The reference README documents its experiment grid as hand-run commands
(/root/reference/README.md:36-343). This driver takes a sweep spec — a
JSON/YAML list of override sets layered on shared base overrides — runs
each experiment through the normal entry point IN ORDER (one accelerator,
sequential by design), then collects every run's final metrics into
`sweep_summary.json` and one comparison report.html.

    # sweep.yaml
    entry: baseline            # or "diffusion"
    base: [data.name=synthetic, data.synthetic_fallback=true,
           model.training.epochs=2]
    runs:
      - [experiment_name=w32, model.architecture.coupling_width=32]
      - [experiment_name=w64, model.architecture.coupling_width=64]

    python tools/sweep.py sweep.yaml --out sweep_out
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_spec(path):
    import yaml

    with open(path) as f:
        spec = yaml.safe_load(f)
    if not isinstance(spec.get("runs"), list) or not spec["runs"]:
        raise SystemExit("spec needs a non-empty 'runs' list")
    return spec


def final_metrics(run_dir):
    """Last value per metric key from the run's metrics.jsonl (same
    parsing + key format as tools/report.py — shared helpers, so summary
    keys can never drift from the report's)."""
    from tools.report import load_stream, series_key

    out = {}
    for rec in load_stream(run_dir):
        v = rec.get("value")
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            out[series_key(rec)] = v
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("spec", help="sweep spec (yaml/json)")
    ap.add_argument("--out", default="sweep_out",
                    help="output dir for summary + report")
    ap.add_argument("--no-report", action="store_true",
                    help="skip the combined report.html")
    args = ap.parse_args(argv)

    spec = load_spec(args.spec)
    entry = spec.get("entry", "baseline")
    if entry == "baseline":
        from run_baseline_experiment import main as run_main
    elif entry == "diffusion":
        from run_diffusion_prior_experiment import main as run_main
    else:
        raise SystemExit(f"unknown entry '{entry}' (baseline|diffusion)")
    base = [str(x) for x in (spec.get("base") or [])]

    os.makedirs(args.out, exist_ok=True)
    summary_path = os.path.join(args.out, "sweep_summary.json")
    rows = []

    def write_summary():  # incrementally: a late failure never loses
        with open(summary_path, "w") as f:  # earlier runs' results
            json.dump({"entry": entry, "base": base, "rows": rows}, f,
                      indent=2)

    for i, overrides in enumerate(spec["runs"]):
        overrides = [str(x) for x in overrides]
        before = set(glob.glob(os.path.join("outputs", "*")))
        print(f"[sweep] run {i + 1}/{len(spec['runs'])}: {overrides}",
              flush=True)
        row = {"overrides": overrides, "run_dir": None, "final": {}}
        try:
            run_main(base + overrides)
        except (Exception, SystemExit) as e:  # keep sweeping; record it
            row["error"] = f"{type(e).__name__}: {e}"
            print(f"[sweep] run {i + 1} FAILED: {row['error']}", flush=True)
        new_dirs = sorted(set(glob.glob(os.path.join("outputs", "*"))) - before,
                          key=os.path.getmtime)
        if new_dirs:  # newest of the dirs this run created (usually one)
            row["run_dir"] = new_dirs[-1]
            row["final"] = final_metrics(row["run_dir"])
        rows.append(row)
        write_summary()

    report_path = None
    if not args.no_report:
        from tools.report import build_html

        run_dirs = [r["run_dir"] for r in rows if r["run_dir"]]
        if run_dirs:
            report_path = os.path.join(args.out, "report.html")
            with open(report_path, "w") as f:
                f.write(build_html(run_dirs, max_images=4))

    print(json.dumps({"summary": summary_path, "report": report_path,
                      "runs": len(rows)}))


if __name__ == "__main__":
    main()
