#!/usr/bin/env python
"""Assemble a training-progress GIF from a run dir's sample grids.

Counterpart of the reference's media GIF (/root/reference/media, linked at
README.md:10): the trainers drop `results/*.png` grids; this stitches them
in step order into an animated GIF.

    python tools/make_progress_gif.py outputs/glow_MNIST_*/ --out progress.gif
"""

import argparse
import glob
import os
import re
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run", help="run dir (glob ok)")
    p.add_argument("--out", default="progress.gif")
    p.add_argument("--pattern", default="*samples*.png")
    p.add_argument("--duration_ms", type=int, default=300)
    args = p.parse_args()

    from PIL import Image

    run = sorted(glob.glob(args.run))[-1]
    files = glob.glob(os.path.join(run, "results", args.pattern))

    def step_of(f):
        m = re.search(r"_s(\d+)", f)
        return int(m.group(1)) if m else 0

    files = sorted(files, key=step_of)
    if not files:
        print(f"no sample grids matching {args.pattern} under {run}/results",
              file=sys.stderr)
        sys.exit(1)

    frames = [Image.open(f).convert("P") for f in files]
    frames[0].save(args.out, save_all=True, append_images=frames[1:],
                   duration=args.duration_ms, loop=0)
    print(f"wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
