#!/usr/bin/env python
"""Full evaluation driver — counterpart of /root/reference/full_eval.py.

Orchestrates train -> render -> metrics over the standard scene lists
(MipNeRF360 images_4/images_2 split, Tanks&Temples, DeepBlending;
full_eval.py:15-75) via subprocess calls to the sibling scripts.
"""
from __future__ import annotations

import os
import subprocess
import sys
from argparse import ArgumentParser

SCRIPTS = os.path.dirname(os.path.abspath(__file__))

MIPNERF360_OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
MIPNERF360_INDOOR = ["room", "counter", "kitchen", "bonsai"]
TANKS_AND_TEMPLES = ["truck", "train"]
DEEP_BLENDING = ["drjohnson", "playroom"]


def run(cmd):
    print("+", " ".join(cmd))
    subprocess.check_call(cmd)


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--output_path", default="./eval")
    parser.add_argument("--mipnerf360", "-m360", default=None)
    parser.add_argument("--tanksandtemples", "-tat", default=None)
    parser.add_argument("--deepblending", "-db", default=None)
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--foundation_model", "-f", default="lseg")
    parser.add_argument("--iterations", type=int, default=30_000)
    args = parser.parse_args(argv)

    scenes = []  # (source, extra train args)
    if args.mipnerf360:
        for s in MIPNERF360_OUTDOOR:
            scenes.append((os.path.join(args.mipnerf360, s), ["-i", "images_4"]))
        for s in MIPNERF360_INDOOR:
            scenes.append((os.path.join(args.mipnerf360, s), ["-i", "images_2"]))
    if args.tanksandtemples:
        scenes += [(os.path.join(args.tanksandtemples, s), [])
                   for s in TANKS_AND_TEMPLES]
    if args.deepblending:
        scenes += [(os.path.join(args.deepblending, s), [])
                   for s in DEEP_BLENDING]

    py = sys.executable
    model_paths = []
    for source, extra in scenes:
        name = os.path.basename(source)
        model_path = os.path.join(args.output_path, name)
        model_paths.append(model_path)
        common = ["-s", source, "-m", model_path, "-f", args.foundation_model,
                  "--eval"]
        if not args.skip_training:
            run([py, os.path.join(SCRIPTS, "train.py"), *common, *extra,
                 "--iterations", str(args.iterations), "--quiet",
                 "--disable_viewer",
                 "--test_iterations", str(args.iterations)])
        if not args.skip_rendering:
            run([py, os.path.join(SCRIPTS, "render.py"), *common,
                 "--iteration", str(args.iterations), "--skip_train"])
    if not args.skip_metrics and model_paths:
        run([py, os.path.join(SCRIPTS, "metrics.py"), "-m", *model_paths])


if __name__ == "__main__":
    main()
