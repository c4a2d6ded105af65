"""Configuration / CLI flag system.

Mirrors the reference's declarative ParamGroup system
(/root/reference/arguments/__init__.py:19-117): three groups (model,
pipeline, optimization) whose dataclass fields become argparse flags, with
the same names/shorthands/defaults, and get_combined_args-style merging of a
saved run config with CLI overrides (reference stores a repr'd Namespace in
``cfg_args``; we store JSON via train.checkpoints.save_cfg_args, and also
parse the reference's Namespace format for interop).

Key deliberate upgrade: the semantic feature channel count is a runtime
value here — the reference requires editing cuda_rasterizer/config.h:16 and
recompiling for each dimension (README.md:316-350).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import re
from typing import Any

from feature3dgs_tpu.model.optim import LRConfig
from feature3dgs_tpu.ops import RasterConfig
from feature3dgs_tpu.train.trainer import OptimizationConfig


@dataclasses.dataclass
class ModelConfig:
    """ModelParams (arguments/__init__.py:47-65). Leading-underscore fields
    get one-letter shorthands in the reference; we keep the same flags."""

    sh_degree: int = 3
    source_path: str = ""          # -s
    foundation_model: str = ""     # -f: '', 'sam', 'lseg'
    model_path: str = ""           # -m
    images: str = "images"         # -i
    resolution: int = -1           # -r
    white_background: bool = False  # -w
    eval: bool = False
    speedup: bool = False
    render_items: tuple = ("RGB", "Depth", "Edge", "Normal", "Curvature",
                           "Feature Map")


@dataclasses.dataclass
class PipelineConfig:
    """PipelineParams (arguments/__init__.py:67-72). The *_python flags of
    the reference toggled CUDA-vs-python math paths; here everything is one
    XLA program, so they select the equivalent alternative formulations for
    cross-checking."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


_SHORTHANDS = {"source_path": "-s", "foundation_model": "-f",
               "model_path": "-m", "images": "-i", "resolution": "-r",
               "white_background": "-w"}


def add_model_args(parser: argparse.ArgumentParser):
    g = parser.add_argument_group("Loading Parameters")
    d = ModelConfig()
    g.add_argument("--sh_degree", type=int, default=d.sh_degree)
    g.add_argument("--source_path", "-s", type=str, default=d.source_path)
    g.add_argument("--foundation_model", "-f", type=str,
                   default=d.foundation_model)
    g.add_argument("--model_path", "-m", type=str, default=d.model_path)
    g.add_argument("--images", "-i", type=str, default=d.images)
    g.add_argument("--resolution", "-r", type=int, default=d.resolution)
    g.add_argument("--white_background", "-w", action="store_true")
    g.add_argument("--eval", action="store_true")
    g.add_argument("--speedup", action="store_true")


def add_pipeline_args(parser: argparse.ArgumentParser):
    g = parser.add_argument_group("Pipeline Parameters")
    g.add_argument("--convert_SHs_python", action="store_true")
    g.add_argument("--compute_cov3D_python", action="store_true")
    g.add_argument("--debug", action="store_true")


def add_optimization_args(parser: argparse.ArgumentParser):
    g = parser.add_argument_group("Optimization Parameters")
    o, lr = OptimizationConfig(), LRConfig()
    g.add_argument("--iterations", type=int, default=o.iterations)
    g.add_argument("--position_lr_init", type=float, default=lr.position_lr_init)
    g.add_argument("--position_lr_final", type=float, default=lr.position_lr_final)
    g.add_argument("--position_lr_delay_mult", type=float,
                   default=lr.position_lr_delay_mult)
    g.add_argument("--position_lr_max_steps", type=int,
                   default=lr.position_lr_max_steps)
    g.add_argument("--feature_lr", type=float, default=lr.feature_lr)
    g.add_argument("--opacity_lr", type=float, default=lr.opacity_lr)
    g.add_argument("--scaling_lr", type=float, default=lr.scaling_lr)
    g.add_argument("--rotation_lr", type=float, default=lr.rotation_lr)
    g.add_argument("--semantic_feature_lr", type=float,
                   default=lr.semantic_feature_lr)
    g.add_argument("--percent_dense", type=float, default=o.percent_dense)
    g.add_argument("--lambda_dssim", type=float, default=o.lambda_dssim)
    g.add_argument("--densification_interval", type=int,
                   default=o.densification_interval)
    g.add_argument("--opacity_reset_interval", type=int,
                   default=o.opacity_reset_interval)
    g.add_argument("--densify_from_iter", type=int, default=o.densify_from_iter)
    g.add_argument("--densify_until_iter", type=int, default=o.densify_until_iter)
    g.add_argument("--densify_grad_threshold", type=float,
                   default=o.densify_grad_threshold)


def add_raster_args(parser: argparse.ArgumentParser):
    g = parser.add_argument_group("Rasterizer Parameters (TPU)")
    r = RasterConfig()
    g.add_argument("--tile_size", type=int, default=None,
                   help="square tile override (sets both tile_w and tile_h)")
    g.add_argument("--tile_w", type=int, default=r.tile_w)
    g.add_argument("--tile_h", type=int, default=r.tile_h)
    g.add_argument("--chunk", type=int, default=r.chunk)
    g.add_argument("--bwd_chunk", type=int, default=r.bwd_chunk,
                   help="backward-kernel chunk (0 = same as --chunk)")
    g.add_argument("--instance_capacity", type=int, default=r.instance_capacity)
    g.add_argument("--tile_capacity", type=int, default=r.tile_capacity)
    g.add_argument("--matmul_precision", type=str, default=r.precision,
                   choices=["highest", "high", "default"])


def extract_model(args) -> ModelConfig:
    m = ModelConfig(
        sh_degree=args.sh_degree,
        source_path=os.path.abspath(args.source_path) if args.source_path else "",
        foundation_model=args.foundation_model, model_path=args.model_path,
        images=args.images, resolution=args.resolution,
        white_background=args.white_background, eval=args.eval,
        speedup=args.speedup)
    return m


def extract_pipeline(args) -> PipelineConfig:
    return PipelineConfig(convert_SHs_python=args.convert_SHs_python,
                          compute_cov3D_python=args.compute_cov3D_python,
                          debug=args.debug)


def extract_optimization(args) -> OptimizationConfig:
    return OptimizationConfig(
        iterations=args.iterations,
        lr=LRConfig(
            position_lr_init=args.position_lr_init,
            position_lr_final=args.position_lr_final,
            position_lr_delay_mult=args.position_lr_delay_mult,
            position_lr_max_steps=args.position_lr_max_steps,
            feature_lr=args.feature_lr, opacity_lr=args.opacity_lr,
            scaling_lr=args.scaling_lr, rotation_lr=args.rotation_lr,
            semantic_feature_lr=args.semantic_feature_lr),
        percent_dense=args.percent_dense, lambda_dssim=args.lambda_dssim,
        densification_interval=args.densification_interval,
        opacity_reset_interval=args.opacity_reset_interval,
        densify_from_iter=args.densify_from_iter,
        densify_until_iter=args.densify_until_iter,
        densify_grad_threshold=args.densify_grad_threshold)


def extract_raster(args) -> RasterConfig:
    tile_size = getattr(args, "tile_size", None)
    tile_w = tile_size if tile_size else getattr(
        args, "tile_w", RasterConfig.tile_w)
    tile_h = tile_size if tile_size else getattr(
        args, "tile_h", RasterConfig.tile_h)
    return RasterConfig(
        tile_w=tile_w, tile_h=tile_h, chunk=args.chunk,
        bwd_chunk=getattr(args, "bwd_chunk", RasterConfig.bwd_chunk),
        instance_capacity=args.instance_capacity,
        tile_capacity=args.tile_capacity, precision=args.matmul_precision)


def parse_saved_namespace(text: str) -> dict:
    """Parse either our JSON cfg_args or the reference's repr'd
    ``Namespace(key=value, ...)`` format (arguments/__init__.py:102-111)."""
    text = text.strip()
    if text.startswith("{"):
        import json
        return json.loads(text)
    m = re.match(r"Namespace\((.*)\)$", text, re.S)
    if not m:
        raise ValueError("unrecognized cfg_args format")
    out: dict[str, Any] = {}
    import ast
    # split on commas not inside brackets/quotes
    body = m.group(1)
    parts, depth, cur = [], 0, ""
    for ch in body:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        parts.append(cur)
    for part in parts:
        k, _, v = part.partition("=")
        try:
            out[k.strip()] = ast.literal_eval(v.strip())
        except (ValueError, SyntaxError):
            out[k.strip()] = v.strip()
    return out


def combine_with_saved(parser: argparse.ArgumentParser, argv=None):
    """get_combined_args behavior (arguments/__init__.py:97-117): values
    from <model_path>/cfg_args unless overridden on the command line."""
    args = parser.parse_args(argv)
    cfg_path = os.path.join(args.model_path, "cfg_args")
    if args.model_path and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            saved = parse_saved_namespace(f.read())
        defaults = {a.dest: parser.get_default(a.dest)
                    for a in parser._actions}
        for k, v in saved.items():
            if hasattr(args, k) and getattr(args, k) == defaults.get(k):
                setattr(args, k, v)
    return args
