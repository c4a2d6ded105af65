"""Multi-chip rendering & training over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.4: hard-coded cuda:0, no
torch.distributed anywhere); these are new TPU-native designs:

  mesh axis     what shards                   collectives
  -----------   ---------------------------   --------------------------------
  "data" (dp)   camera batch                  psum of loss + param grads
  "tile" (sp)   the tile grid of each image   all_gather of rendered tiles for
                (spatial parallelism — the     image-level losses (SSIM);
                analog of the CUDA per-tile    psum of per-Gaussian grads (the
                blocks, across chips)          TPU analog of atomicAdd +
                                               all-reduce)

Design: per-Gaussian preprocessing + binning are cheap O(N) work and run
redundantly in every shard (identical results, zero communication);
compositing — the FLOPs/memory-dominant stage — is sharded over tiles: each
device composites its contiguous slice of the padded tile grid. Image-level
losses require the full frame, so tiles are all_gather'ed over "tile" (its
transpose, a reduce-scatter, routes pixel cotangents back to tile owners).
Per-Gaussian gradients come out of each shard's scatter-adds and are summed
across the mesh by shard_map's AD (replicated-input cotangent psum).

Everything rides ICI via XLA collectives; the same code drives 1 chip, one
host, or a multi-host slice (after jax.distributed.initialize).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from feature3dgs_tpu.core import projection as proj_lib
from feature3dgs_tpu.core.projection import CameraView
from feature3dgs_tpu.model import gaussians as G
from feature3dgs_tpu.model import optim
from feature3dgs_tpu.model.decoder import apply_decoder
from feature3dgs_tpu.ops import RasterConfig
from feature3dgs_tpu.ops import binning as binning_lib
from feature3dgs_tpu.ops import composite as composite_lib
from feature3dgs_tpu.ops.rasterize import rect_radius, tiles_to_image
from feature3dgs_tpu.train import losses as L


def make_mesh(shape: Sequence[int] | None = None,
              axis_names: Sequence[str] = ("data", "tile"),
              devices=None) -> jax.sharding.Mesh:
    """Mesh over the given (default: all) devices; default shape puts
    everything on axis 0."""
    devices = list(devices) if devices is not None else list(jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(tuple(shape))
    return jax.sharding.Mesh(arr, tuple(axis_names))


def _pad_tiles(arr, multiple: int, fill):
    rem = (-arr.shape[0]) % multiple
    if rem == 0:
        return arr
    return jnp.pad(arr, [(0, rem)] + [(0, 0)] * (arr.ndim - 1),
                   constant_values=fill)


def _local_composite(params, state, cam: CameraView, bg, config, n_tile,
                     ndc_offset=None):
    """Per-device: replicated preprocess + binning, composite own tile slice,
    all_gather tiles back to a full image. Runs INSIDE shard_map."""
    grid = config.grid(cam.width, cam.height)

    opacity = jnp.where(state.alive, G.get_opacity(params), 0.0)
    pre = proj_lib.preprocess(
        params.xyz, opacity, cam,
        scales=G.get_scaling(params), rotations=G.get_rotation(params),
        shs=G.get_features(params), sh_degree=state.active_sh_degree)

    xy = pre.xy
    if ndc_offset is not None:
        wh = jnp.asarray([cam.width, cam.height], xy.dtype)
        xy = xy + ndc_offset * wh * 0.5

    # opacity-aware binning rects — same exact work elimination as the
    # single-device path (rasterize.rect_radius); outputs keep 3-sigma radii
    rect_min, rect_max = proj_lib.tile_rect(
        xy, rect_radius(pre.radius, pre.opacity),
        grid.grid_x, grid.grid_y, grid.tile_w, grid.tile_h)
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    valid = pre.valid & (area > 0) & state.alive

    backend = config.backend
    if backend == "auto":
        platform = jax.devices()[0].platform
        backend = "pallas" if platform in ("tpu", "axon") else "xla"
    use_pallas = backend in ("pallas", "pallas_interpret")

    bins = binning_lib.bin_gaussians(
        jax.lax.stop_gradient(rect_min), jax.lax.stop_gradient(rect_max),
        jax.lax.stop_gradient(pre.depth), jax.lax.stop_gradient(valid), grid,
        instance_capacity=config.instance_capacity_or_default,
        tile_capacity=config.tile_capacity,
        build_tile_lists=not use_pallas)

    # Row-aligned tile sharding: pad the grid to a whole number of tile
    # ROWS per device, so each shard's flat slice is a rectangle
    # [rows_loc, grid_x] of the tile lattice — the sharded feature-loss
    # resize (losses.resize_bilinear_from_tile_rows) needs that to contract
    # its interpolation operators locally.
    row_mult = n_tile * grid.grid_x
    ti = jax.lax.axis_index("tile")
    if use_pallas:
        # The Pallas kernels themselves run tile-sharded: each device walks
        # only its contiguous slice of the tile grid (starts/counts slice +
        # global tile_base offset) against the replicated instance slab; the
        # backward writes only its slice's slab segments (rest stays zero
        # via the aliased init) so the post-kernel segment-sum already
        # yields this shard's partial per-Gaussian grads.
        ts_pad = _pad_tiles(bins.tile_starts, row_mult, 0)
        tc_pad = _pad_tiles(bins.tile_counts, row_mult, 0)
        t_loc = ts_pad.shape[0] // n_tile
        tile_base = ti * t_loc
        starts_l = jax.lax.dynamic_slice_in_dim(ts_pad, tile_base, t_loc)
        counts_l = jax.lax.dynamic_slice_in_dim(tc_pad, tile_base, t_loc)
        from feature3dgs_tpu.ops import pallas_raster
        out = pallas_raster.composite_pallas(
            starts_l, counts_l, bins.gid_sorted, bins.total,
            xy, pre.conic, pre.opacity, (pre.rgb, G.get_semantic(params)),
            pre.depth, tile_base, grid, min(max(config.chunk, 8), 256),
            config.feature_alpha_grad, backend == "pallas_interpret",
            config.tiles_per_program, config.alpha_matmul,
            config.bwd_chunk)
    else:
        pix_xy = composite_lib.tile_pixel_coords(grid, xy.dtype)
        tl = _pad_tiles(bins.tile_lists, row_mult, -1)
        px = _pad_tiles(pix_xy, row_mult, 0.0)
        t_loc = tl.shape[0] // n_tile
        tl_local = jax.lax.dynamic_slice_in_dim(tl, ti * t_loc, t_loc, axis=0)
        px_local = jax.lax.dynamic_slice_in_dim(px, ti * t_loc, t_loc, axis=0)

        out = composite_lib.composite(
            tl_local, px_local, xy, pre.conic, pre.opacity, pre.rgb,
            G.get_semantic(params), pre.depth,
            config.chunk, config.precision, config.feature_alpha_grad)

    color_l = out.color + out.final_T[..., None] * bg
    # gather the small channels across the tile axis -> full frame on every
    # device; the (wide) feature tiles stay LOCAL — the train loss resizes
    # them shard-locally and psums the resized map, and forward-render
    # callers all_gather them explicitly.
    color = jax.lax.all_gather(color_l, "tile", tiled=True)[: grid.num_tiles]
    depth = jax.lax.all_gather(out.depth, "tile", tiled=True)[: grid.num_tiles]

    aux = {
        "radii": jnp.where(valid, pre.radius, 0.0),
        "visibility": valid & (pre.radius > 0),
        "total_instances": bins.total,
        "max_tile_count": jnp.max(bins.tile_counts),
    }
    rows_loc = t_loc // grid.grid_x
    meta = {"row0": ti * rows_loc, "rows_loc": rows_loc,
            "gy_pad": (n_tile * rows_loc)}
    return (tiles_to_image(color, grid), out.feature,
            tiles_to_image(depth, grid), aux, meta)


def rasterize_tile_sharded(params, state, cam: CameraView, *, bg,
                           config: RasterConfig, mesh: jax.sharding.Mesh):
    """Single-camera forward render with tiles sharded over 'tile'
    (and redundantly computed over other mesh axes). Differentiable."""
    n_tile = mesh.shape["tile"]

    def shard_fn(params, state_alive, bg):
        st = _StateView(state, state_alive)
        color, feature_local, depth, aux, meta = _local_composite(
            params, st, cam, bg, config, n_tile)
        grid = config.grid(cam.width, cam.height)
        feature = jax.lax.all_gather(
            feature_local, "tile", tiled=True)[: grid.num_tiles]
        return color, tiles_to_image(feature, grid), depth

    # alive passed explicitly so the pytree in_specs stay simple
    specs_in = (jax.tree.map(lambda _: P(), params), P(), P())
    color, feature, depth = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=specs_in,
        out_specs=(P(), P(), P()), check_vma=False,
    )(params, state.alive, bg)
    return {"color": color, "feature": feature, "depth": depth}


class _StateView:
    """Lightweight stand-in exposing the fields _local_composite needs."""

    def __init__(self, state, alive):
        self.alive = alive
        self.active_sh_degree = state.active_sh_degree


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "ocfg", "rcfg", "speedup", "max_sh_degree",
                     "shard_gaussians", "shard_instances"),
    donate_argnums=(0,))  # TrainState buffers alias their updates in-place
def sharded_train_step(
    ts,                          # train.trainer.TrainState
    cam_arrays: dict,            # view/proj/campos/tan_fovx/tan_fovy, leading dim B
    gt_images: jnp.ndarray,      # [B,H,W,3]
    gt_features: jnp.ndarray,    # [B,h,w,F]
    bg: jnp.ndarray,
    iteration: jnp.ndarray,      # [B] span of 1-based iterations (scalar ok
                                 # for B=1): group_lrs folds the span's
                                 # per-iteration schedule into the fused
                                 # update (linear-scaling rule)
    *,
    mesh: jax.sharding.Mesh,
    ocfg,                        # train.trainer.OptimizationConfig
    rcfg: RasterConfig,
    speedup: bool = False,
    max_sh_degree: int = 3,
    shard_gaussians: bool = False,
    shard_instances: bool = False,
):
    """One dp x sp training step over a camera batch — the mesh counterpart
    of train.trainer.train_step (same TrainState in/out contract).

    Semantics: the loss is the MEAN over the B cameras of the reference's
    per-iteration loss (train.py:98-105); gradients are psum'ed over the
    mesh, Adam applies once. Densification statistics take the union of
    visibility / max radii and the summed ndc gradients over the batch, and
    are folded into gstate like the single-device step. Non-finite steps
    are discarded device-side (same failure-detection contract).
    """
    from feature3dgs_tpu.train.trainer import TrainState

    b = gt_images.shape[0]
    height, width = gt_images.shape[1], gt_images.shape[2]
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]
    if b % n_data:
        raise ValueError(f"camera batch {b} not divisible by data axis {n_data}")
    b_loc = b // n_data
    gstate = ts.gstate

    # Gaussian-axis sharding (SURVEY §2.4 row 2, "Gaussian-sharded with
    # gather"): params enter the render shard_map row-sharded over ALL
    # devices and are all_gather'ed transiently inside; shard_map's AD
    # transposes that gather into a psum_scatter, so per-Gaussian gradients
    # leave the mesh already row-sharded (reduce-scatter, comm-optimal) and
    # Adam / densify / growth run on 1/n_dev-size shards per device. With
    # the flag off everything stays replicated (the small-scene fast path).
    gauss_axes = ("data", "tile")
    if shard_gaussians:
        gauss_spec = P(gauss_axes)

        def _gather(x):
            return jax.lax.all_gather(x, gauss_axes, tiled=True)
    else:
        gauss_spec = P()

        def _gather(x):
            return x

    if shard_instances:
        if not shard_gaussians:
            raise ValueError(
                "shard_instances requires shard_gaussians: the instance "
                "exchange only makes sense when Gaussian rows are "
                "row-sharded over the mesh")
        backend = rcfg.backend
        if backend == "auto":
            backend = ("pallas" if jax.devices()[0].platform
                       in ("tpu", "axon") else "xla")
        if backend not in ("pallas", "pallas_interpret"):
            raise ValueError(
                "shard_instances needs the pallas compositing path (the "
                "XLA compositor consumes padded per-tile index matrices, "
                f"not sorted instance segments); got backend={backend}")
        loss_fn = _make_exchange_loss_fn(
            cam_arrays, gt_images, gt_features, bg, gstate, mesh=mesh,
            rcfg=rcfg, ocfg=ocfg, speedup=speedup, interpret=(
                backend == "pallas_interpret"))
        return _apply_step_tail(ts, loss_fn, iteration, gstate, mesh, ocfg,
                                speedup, shard_gaussians, gauss_axes)

    def loss_fn(params, ndc_offset, decoder):
        def shard_fn(view, proj, campos, tfx, tfy, gt_img, gt_feat,
                     params, alive, ndc_offset, decoder):
            params = jax.tree.map(_gather, params)
            alive = _gather(alive)
            st = _StateView(gstate, alive)
            total = jnp.float32(0.0)
            ll1 = jnp.float32(0.0)
            ll1_feat = jnp.float32(0.0)
            psnr = jnp.float32(0.0)
            vis = jnp.zeros((params.capacity,), bool)
            rad = jnp.zeros((params.capacity,), jnp.float32)
            n_inst = jnp.int32(0)
            mtc = jnp.int32(0)
            for i in range(b_loc):
                cam = CameraView(view=view[i], proj=proj[i], campos=campos[i],
                                 tan_fovx=tfx[i], tan_fovy=tfy[i],
                                 width=width, height=height)
                color, feature_local, depth, aux, meta = _local_composite(
                    params, st, cam, bg, rcfg, n_tile,
                    ndc_offset=ndc_offset)
                rgb_term, l1_i = L.rgb_loss(color, gt_img[i], ocfg.lambda_dssim)
                # sharded feature resize: each device contracts its OWN
                # tile rows and the psum of the small resized maps replaces
                # an all_gather of the full feature tile array; the resize
                # FLOPs shard with the tiles instead of running
                # tile-redundantly
                fmap = jax.lax.psum(
                    L.resize_bilinear_from_tile_rows(
                        feature_local, rcfg.grid(width, height),
                        gt_feat.shape[1], gt_feat.shape[2],
                        meta["row0"], meta["rows_loc"], meta["gy_pad"]),
                    "tile")
                if speedup:
                    fmap = apply_decoder(decoder, fmap)
                # fp16 GT upcast fused into the loss reduce (see train_step)
                lf_i = L.l1_loss(fmap, gt_feat[i].astype(jnp.float32))
                total = total + rgb_term + ocfg.feature_loss_weight * lf_i
                ll1 = ll1 + l1_i
                ll1_feat = ll1_feat + lf_i
                psnr = psnr + L.psnr(jnp.clip(color, 0, 1),
                                     jnp.clip(gt_img[i], 0, 1))
                vis = vis | aux["visibility"]
                rad = jnp.maximum(rad, aux["radii"])
                n_inst = jnp.maximum(n_inst, aux["total_instances"])
                mtc = jnp.maximum(mtc, aux["max_tile_count"])
            # Mean over batch; the tile-redundant computation is normalized
            # by n_tile so the full-mesh psum returns the true mean (and its
            # transpose delivers exactly one cotangent share per tile owner).
            norm = 1.0 / (b * n_tile)
            loss = jax.lax.psum(total * norm, ("data", "tile"))
            scalars = jax.lax.psum(
                jnp.stack([ll1 * norm, ll1_feat * norm, psnr * norm]),
                ("data", "tile"))
            vis = jax.lax.pmax(vis.astype(jnp.int32), ("data", "tile")) > 0
            rad = jax.lax.pmax(rad, ("data", "tile"))
            n_inst = jax.lax.pmax(n_inst, ("data", "tile"))
            mtc = jax.lax.pmax(mtc, ("data", "tile"))
            return loss, scalars, vis, rad, n_inst, mtc

        outs = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P("data"), P("data"),
                      P("data"), P("data"),
                      jax.tree.map(lambda _: gauss_spec, params), gauss_spec,
                      P(),
                      jax.tree.map(lambda _: P(), decoder)),
            out_specs=(P(), P(), P(), P(), P(), P()), check_vma=False,
        )(cam_arrays["view"], cam_arrays["proj"], cam_arrays["campos"],
          cam_arrays["tan_fovx"], cam_arrays["tan_fovy"],
          gt_images, gt_features, params, gstate.alive, ndc_offset, decoder)
        loss, scalars, vis, rad, n_inst, mtc = outs
        return loss, (scalars, vis, rad, n_inst, mtc)

    return _apply_step_tail(ts, loss_fn, iteration, gstate, mesh, ocfg,
                            speedup, shard_gaussians, gauss_axes)


def _make_exchange_loss_fn(cam_arrays, gt_images, gt_features, bg, gstate,
                           *, mesh, rcfg, ocfg, speedup, interpret,
                           slack: float = 2.0):
    """Gaussian-sharded O(N) stages via a tile-owner instance exchange —
    the distributed form of the reference's duplicate/sort/range machinery
    (rasterizer_impl.cu:70-138) and the scale-out step the roofline's
    "Multi-chip scaling ceiling" calls for.

    Per device (one of D = n_data*n_tile, owning 1/D of the Gaussian rows):

      1. preprocess ONLY its own rows for every camera of this step
         (total preprocess work N*n_data spread evenly over D devices;
         its AD stays row-sharded);
      2. all_gather the small per-camera misc table [n_data, N, 12]
         (xy, conic, opacity, rgb, depth — the gather's AD transpose is a
         psum_scatter, so gradients come back row-sharded) and the
         semantic features [N, F] (the only wide gather; scale/quat/SH
         stay sharded — LESS comm than the previous full-params gather);
      3. expand its rows into (tile, depth, gid) instances per camera
         (1/D of the expansion + cumsum work);
      4. route instances to their (camera row, tile-slice owner) device
         with ONE all_to_all of [D, cap_pair, 3] f32 triples;
      5. sort/pack/composite only its received slice: the sort, the slab
         pack gather, the backward d_slab and the per-Gaussian segment-sum
         all shrink ~D-fold (the segment-sum was the top replicated cost,
         ~9 ms/step at the bench config).

    Overflow contract: cap_pair = slack * instance_capacity / (n_tile*D)
    per (src,dst) pair; dropped instances (source expansion or pair
    overflow) force the reported num_instances to instance_capacity so the
    trainer's existing growth logic re-jits with a larger bucket.
    Depth-tie ordering within a tile may differ from the single-sort path
    (instances arrive grouped by source device), so parity vs the
    replicated path is tolerance-based, not bitwise."""
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]
    d_tot = n_data * n_tile
    b = gt_images.shape[0]
    b_loc = b // n_data
    height, width = gt_images.shape[1], gt_images.shape[2]
    grid = rcfg.grid(width, height)
    t_true = grid.num_tiles
    row_mult = n_tile * grid.grid_x
    t_pad = -(-t_true // row_mult) * row_mult
    t_loc = t_pad // n_tile
    rows_loc = t_loc // grid.grid_x
    i_cap = rcfg.instance_capacity_or_default
    # static exchange capacities: per-source per-camera expansion slots
    # (128-aligned — expand_instances' 2-D (8,128) layout requires it), and
    # the per-(src,dst)-pair routing budget (8-aligned)
    l_src = -(-int(slack * i_cap) // (128 * d_tot)) * 128
    cap_pair = -(-int(slack * i_cap) // (8 * n_tile * d_tot)) * 8
    k_chunk = min(max(rcfg.chunk, 8), 256)
    wh = np.asarray([width, height], np.float32)

    def loss_fn(params, ndc_offset, decoder):
        def shard_fn(view, proj, campos, tfx, tfy, gt_img, gt_feat,
                     params, alive, ndc_offset, decoder):
            di = jax.lax.axis_index("data")
            ti = jax.lax.axis_index("tile")
            flat = di * n_tile + ti
            n_loc = params.capacity          # local row-shard length
            cap_full = n_loc * d_tot
            assert cap_full < (1 << 24), (
                "gid rides the exchange as f32; capacity must stay "
                "f32-exact")
            row0 = flat * n_loc
            feat_full = jax.lax.all_gather(
                G.get_semantic(params), ("data", "tile"), tiled=True)
            opacity_loc = jnp.where(alive, G.get_opacity(params), 0.0)
            scales_loc = G.get_scaling(params)
            rot_loc = G.get_rotation(params)
            shs_loc = G.get_features(params)
            off_loc = jax.lax.dynamic_slice_in_dim(ndc_offset, row0, n_loc)

            total = jnp.float32(0.0)
            ll1 = jnp.float32(0.0)
            ll1_feat = jnp.float32(0.0)
            psnr = jnp.float32(0.0)
            vis_loc = jnp.zeros((n_loc,), bool)
            rad_loc = jnp.zeros((n_loc,), jnp.float32)
            n_inst = jnp.int32(0)
            mtc = jnp.int32(0)
            dropped = jnp.int32(0)

            for i in range(b_loc):
                # -- 1+3: sharded preprocess + expansion for ALL n_data
                # cameras of batch position i (camera of data row r is
                # global batch slot r*b_loc + i)
                misc_r, keys = [], []
                cam_totals = []
                for r in range(n_data):
                    k = r * b_loc + i
                    cam = CameraView(
                        view=view[k], proj=proj[k], campos=campos[k],
                        tan_fovx=tfx[k], tan_fovy=tfy[k],
                        width=width, height=height)
                    pre = proj_lib.preprocess(
                        params.xyz, opacity_loc, cam, scales=scales_loc,
                        rotations=rot_loc, shs=shs_loc,
                        sh_degree=gstate.active_sh_degree)
                    xy = pre.xy + off_loc * jnp.asarray(wh) * 0.5
                    rect_min, rect_max = proj_lib.tile_rect(
                        xy, rect_radius(pre.radius, pre.opacity),
                        grid.grid_x, grid.grid_y,
                        grid.tile_w, grid.tile_h)
                    area = ((rect_max[:, 0] - rect_min[:, 0])
                            * (rect_max[:, 1] - rect_min[:, 1]))
                    valid = pre.valid & (area > 0) & alive
                    misc_r.append(jnp.concatenate([
                        xy, pre.conic, pre.opacity[:, None], pre.rgb,
                        pre.depth[:, None]], axis=1))      # [n_loc, 10]
                    tile_k, depth_k, gid_k, counts_k, tot_k = (
                        binning_lib.expand_instances(
                            jax.lax.stop_gradient(rect_min),
                            jax.lax.stop_gradient(rect_max),
                            jax.lax.stop_gradient(pre.depth),
                            jax.lax.stop_gradient(valid), grid,
                            instance_capacity=l_src))
                    gid_glob = jnp.where(gid_k >= 0, gid_k + row0, -1)
                    dest = jnp.where(
                        gid_k >= 0, r * n_tile + tile_k // t_loc, d_tot)
                    keys.append((dest, tile_k, depth_k, gid_glob, counts_k))
                    cam_totals.append(tot_k)
                    vis_loc = vis_loc | (valid & (pre.radius > 0))
                    rad_loc = jnp.maximum(
                        rad_loc, jnp.where(valid, pre.radius, 0.0))

                # -- 2: gather the per-camera misc tables (rows -> full)
                misc = jax.lax.all_gather(
                    jnp.stack(misc_r), ("data", "tile"), axis=1, tiled=True)

                # -- 4: route instances to (camera row, tile-slice) owners
                dest_a = jnp.concatenate([kk[0] for kk in keys])
                tile_a = jnp.concatenate([kk[1] for kk in keys])
                depth_a = jnp.concatenate([kk[2] for kk in keys])
                gid_a = jnp.concatenate([kk[3] for kk in keys])
                dest_s, tile_s, depth_s, gid_s = jax.lax.sort(
                    (dest_a, tile_a, depth_a, gid_a), num_keys=1,
                    is_stable=True)
                # per-dest counts from the (valid & fits)-masked per-tile
                # histograms: counts over the dest's tile window, no
                # L-length scatter needed
                cnt_sd = jnp.stack([
                    jnp.pad(kk[4], (0, t_pad - t_true))
                    .reshape(n_tile, t_loc).sum(axis=1)
                    for kk in keys]).reshape(d_tot)        # [D]
                cnt_c = jnp.minimum(cnt_sd, cap_pair)
                dropped = jnp.maximum(dropped, jnp.max(cnt_sd - cnt_c))
                starts_sd = jnp.cumsum(cnt_sd) - cnt_sd
                jrow = jax.lax.broadcasted_iota(
                    jnp.int32, (d_tot, cap_pair), 1)
                take = jrow < cnt_c[:, None]
                pos = jnp.clip(starts_sd[:, None] + jrow, 0,
                               dest_a.shape[0] - 1)
                stage = jnp.stack([
                    jnp.where(take, tile_s[pos], 0).astype(jnp.float32),
                    jnp.where(take, depth_s[pos], jnp.inf),
                    jnp.where(take, gid_s[pos], -1).astype(jnp.float32),
                ], axis=-1)                                # [D, cap, 3]
                # source-expansion overflow also counts as a drop
                dropped = jnp.maximum(dropped, jnp.maximum(
                    jnp.max(jnp.stack(cam_totals)) - l_src, 0))
                recv = jax.lax.all_to_all(
                    stage, ("data", "tile"), 0, 0, tiled=True)
                recv = recv.reshape(d_tot * cap_pair, 3)
                r_gid = recv[:, 2].astype(jnp.int32)
                r_valid = r_gid >= 0
                r_tl = jnp.where(
                    r_valid, recv[:, 0].astype(jnp.int32) - ti * t_loc,
                    t_loc)
                r_depth = jnp.where(r_valid, recv[:, 1], jnp.inf)

                # -- 5: local sort + pack + composite of MY tile slice
                counts_l = jnp.zeros((t_loc + 1,), jnp.int32).at[r_tl].add(
                    1, mode="drop")[:t_loc]
                _, gid_sorted_l, starts_l = binning_lib.sort_instances(
                    r_tl, r_depth, r_gid, counts_l, t_loc)

                misc_b = misc[di]                          # [cap_full, 10]
                from feature3dgs_tpu.ops import pallas_raster
                out = pallas_raster.composite_pallas(
                    starts_l, counts_l, gid_sorted_l,
                    jnp.int32(0),
                    misc_b[:, 0:2], misc_b[:, 2:5], misc_b[:, 5],
                    (misc_b[:, 6:9], feat_full), misc_b[:, 9],
                    ti * t_loc, grid, k_chunk, rcfg.feature_alpha_grad,
                    interpret, rcfg.tiles_per_program, rcfg.alpha_matmul,
                    rcfg.bwd_chunk)

                color_l = out.color + out.final_T[..., None] * bg
                color = tiles_to_image(jax.lax.all_gather(
                    color_l, "tile", tiled=True)[:t_true], grid)

                rgb_term, l1_i = L.rgb_loss(color, gt_img[i],
                                            ocfg.lambda_dssim)
                fmap = jax.lax.psum(
                    L.resize_bilinear_from_tile_rows(
                        out.feature, grid,
                        gt_feat.shape[1], gt_feat.shape[2],
                        ti * rows_loc, rows_loc, n_tile * rows_loc),
                    "tile")
                if speedup:
                    fmap = apply_decoder(decoder, fmap)
                lf_i = L.l1_loss(fmap, gt_feat[i].astype(jnp.float32))
                total = total + rgb_term + ocfg.feature_loss_weight * lf_i
                ll1 = ll1 + l1_i
                ll1_feat = ll1_feat + lf_i
                psnr = psnr + L.psnr(jnp.clip(color, 0, 1),
                                     jnp.clip(gt_img[i], 0, 1))
                # per-camera true totals (psum of source partials); max
                # over the batch drives rcfg growth like bins.total
                for r in range(n_data):
                    n_inst = jnp.maximum(n_inst, jax.lax.psum(
                        cam_totals[r], ("data", "tile")))
                mtc = jnp.maximum(mtc, jnp.max(counts_l))

            # scatter local-row stats into full-capacity arrays (pmax
            # across the mesh unions the shards)
            vis = jax.lax.dynamic_update_slice(
                jnp.zeros((cap_full,), bool), vis_loc, (row0,))
            rad = jax.lax.dynamic_update_slice(
                jnp.zeros((cap_full,), jnp.float32), rad_loc, (row0,))

            # exchange drops force a capacity-growth report (cap_pair
            # derives from instance_capacity)
            dropped = jax.lax.pmax(dropped, ("data", "tile"))
            n_inst = jnp.where(dropped > 0,
                               jnp.maximum(n_inst, jnp.int32(i_cap)),
                               n_inst)

            # every (camera, tile-window) is computed exactly once here;
            # the rgb/feature losses are still evaluated redundantly on
            # each of the n_tile devices of a data row (full gathered
            # frame), so the same 1/(b*n_tile) normalization applies
            norm = 1.0 / (b * n_tile)
            loss = jax.lax.psum(total * norm, ("data", "tile"))
            scalars = jax.lax.psum(
                jnp.stack([ll1 * norm, ll1_feat * norm, psnr * norm]),
                ("data", "tile"))
            vis = jax.lax.pmax(vis.astype(jnp.int32), ("data", "tile")) > 0
            rad = jax.lax.pmax(rad, ("data", "tile"))
            n_inst = jax.lax.pmax(n_inst, ("data", "tile"))
            mtc = jax.lax.pmax(mtc, ("data", "tile"))
            return loss, scalars, vis, rad, n_inst, mtc

        gauss_spec = P(("data", "tile"))
        outs = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(),      # cameras: replicated
                      P("data"), P("data"),         # GT: host-striped
                      jax.tree.map(lambda _: gauss_spec, params),
                      gauss_spec, P(),
                      jax.tree.map(lambda _: P(), decoder)),
            out_specs=(P(), P(), P(), P(), P(), P()), check_vma=False,
        )(cam_arrays["view"], cam_arrays["proj"], cam_arrays["campos"],
          cam_arrays["tan_fovx"], cam_arrays["tan_fovy"],
          gt_images, gt_features, params, gstate.alive, ndc_offset, decoder)
        loss, scalars, vis, rad, n_inst, mtc = outs
        return loss, (scalars, vis, rad, n_inst, mtc)

    return loss_fn


def _apply_step_tail(ts, loss_fn, iteration, gstate, mesh, ocfg, speedup,
                     shard_gaussians, gauss_axes):
    """Shared tail of the sharded train step: grad, Adam, densify-stat
    fold, device-side failure guard, sharding re-pin, metrics. ``loss_fn``
    is (params, ndc_offset, decoder) -> (loss, (scalars, vis, rad, n_inst,
    mtc)) — the replicated/gathered path or the instance-exchange path."""
    from feature3dgs_tpu.train.trainer import TrainState

    zeros_offset = jnp.zeros((ts.params.capacity, 2), jnp.float32)
    (loss, (scalars, vis, rad, n_inst, mtc)), (g_params, g_offset, g_dec) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            ts.params, zeros_offset, ts.decoder))

    lrs = optim.group_lrs(ocfg.lr, iteration, gstate.spatial_lr_scale)
    # device-side failure detection, same contract as train_step; gated
    # inside adam_update so the select fuses into the update fusions
    finite = jnp.isfinite(loss)
    params, adam = optim.adam_update(ts.params, g_params, ts.adam, lrs,
                                     keep=finite)

    decoder, decoder_adam = ts.decoder, ts.decoder_adam
    if speedup:
        decoder, decoder_adam = optim.tensor_adam_update(
            ts.decoder, g_dec, ts.decoder_adam, lr=1e-4)

    from feature3dgs_tpu.model import density
    gstate = density.add_densification_stats(gstate, g_offset, vis, rad)

    def _keep(new, old):
        return jax.tree.map(lambda a, b: jnp.where(finite, a, b), new, old)

    gstate = _keep(gstate, ts.gstate)
    if speedup:
        decoder = _keep(decoder, ts.decoder)
        decoder_adam = _keep(decoder_adam, ts.decoder_adam)

    if shard_gaussians:
        # Pin the outgoing state to the same row sharding the inputs carry:
        # GSPMD would otherwise pick its own output layouts (densify-stat
        # mixing pulls toward replication), which defeats the memory story
        # and flips input shardings (-> recompile) on the next call.
        cap = params.capacity
        g_sh = jax.sharding.NamedSharding(mesh, P(gauss_axes))
        r_sh = jax.sharding.NamedSharding(mesh, P())

        def _pin(x):
            if hasattr(x, "ndim") and x.ndim and x.shape[0] == cap:
                return jax.lax.with_sharding_constraint(x, g_sh)
            return jax.lax.with_sharding_constraint(x, r_sh)

        params, adam, gstate = jax.tree.map(_pin, (params, adam, gstate))

    metrics = {
        "finite": finite,
        "loss": loss, "l1": scalars[0], "l1_feature": scalars[1],
        "psnr": scalars[2],
        "num_instances": n_inst,
        "max_tile_count": mtc,
        "num_active": gstate.num_active,
    }
    return TrainState(params=params, gstate=gstate, adam=adam,
                      decoder=decoder, decoder_adam=decoder_adam), metrics


def stack_cameras(cams: Sequence[CameraView]) -> dict:
    """Stack same-resolution CameraViews into batched arrays for
    sharded_train_step."""
    return {
        "view": jnp.stack([c.view for c in cams]),
        "proj": jnp.stack([c.proj for c in cams]),
        "campos": jnp.stack([c.campos for c in cams]),
        "tan_fovx": jnp.stack([jnp.asarray(c.tan_fovx) for c in cams]),
        "tan_fovy": jnp.stack([jnp.asarray(c.tan_fovy) for c in cams]),
    }
