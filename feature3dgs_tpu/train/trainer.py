"""Training: jitted step + host loop.

The functional counterpart of /root/reference/train.py:36-178. One jitted
``train_step`` fuses render -> losses -> backward -> Adam -> densification
stats into a single XLA program. Schedule-driven host events (SH degree
bump every 1000 iters, densify every 100 in [500, 15000], opacity reset
every 3000, checkpointing) run between steps exactly like the reference's
with-torch.no_grad blocks (train.py:110-153) — densify/reset are themselves
jitted functions over fixed-capacity arrays.

Loss (train.py:98-105):
  (1 - λ)·L1(rgb) + λ·(1 - SSIM(rgb)) + 1.0·L1(feature)
with the rendered feature map bilinearly resized (align_corners=True) to the
teacher map and optionally lifted by the speed-up decoder.
"""
from __future__ import annotations

import dataclasses
import functools
import random
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from feature3dgs_tpu.core.projection import CameraView
from feature3dgs_tpu.data.dataset import SceneData
from feature3dgs_tpu.model import gaussians as G
from feature3dgs_tpu.model import density, optim
from feature3dgs_tpu.model.decoder import apply_decoder, init_decoder
from feature3dgs_tpu.ops import RasterConfig
from feature3dgs_tpu.render import renderer
from feature3dgs_tpu.train import losses as L


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """Mirrors the reference OptimizationParams (arguments/__init__.py:74-95)."""

    iterations: int = 30_000
    lr: optim.LRConfig = optim.LRConfig()
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    feature_loss_weight: float = 1.0


@struct.dataclass
class TrainState:
    params: G.GaussianParams
    gstate: G.GaussianState
    adam: optim.AdamState
    decoder: Optional[dict]
    decoder_adam: Optional[optim.TensorAdamState]


@functools.partial(
    jax.jit,
    static_argnames=("ocfg", "rcfg", "speedup", "max_sh_degree"),
    # donate the TrainState: params/adam/gstate buffers alias their updates
    # in-place (removes ~4ms/step of XLA copy ops for the 100K-Gaussian
    # bench config; callers never reuse the old state)
    donate_argnums=(0,))
def train_step(
    ts: TrainState,
    cam: CameraView,
    gt_image: jnp.ndarray,        # [H,W,3]
    gt_feature: jnp.ndarray,      # [h,w,F_out]
    bg: jnp.ndarray,              # [3]
    iteration: jnp.ndarray,       # scalar int32 (1-based, for the xyz LR)
    *,
    ocfg: OptimizationConfig,
    rcfg: RasterConfig,
    speedup: bool,
    max_sh_degree: int,
):
    gstate = ts.gstate
    zeros_offset = jnp.zeros((ts.params.capacity, 2), jnp.float32)

    def loss_fn(params, ndc_offset, decoder):
        out = renderer.render(params, gstate, cam, bg=bg, config=rcfg,
                              ndc_offset=ndc_offset)
        rgb, ll1 = L.rgb_loss(out.color, gt_image, ocfg.lambda_dssim)
        # resize straight from tile layout: the [H,W,F] feature image is
        # never materialized (out.feature gets DCE'd by XLA)
        fmap = L.resize_bilinear_from_tiles(
            out.feature_tiles, rcfg.grid(cam.width, cam.height),
            gt_feature.shape[0], gt_feature.shape[1])
        if speedup:
            fmap = apply_decoder(decoder, fmap)
        # fp16 teacher maps upcast here (fused into the loss reduce) —
        # torch's fp16->f32 promotion semantics in the reference l1_loss
        # (train.py:105); no-op for f32 maps
        ll1_feat = L.l1_loss(fmap, gt_feature.astype(jnp.float32))
        total = rgb + ocfg.feature_loss_weight * ll1_feat
        return total, (out, ll1, ll1_feat)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
    (loss, (out, ll1, ll1_feat)), (g_params, g_offset, g_dec) = grad_fn(
        ts.params, zeros_offset, ts.decoder)

    lrs = optim.group_lrs(ocfg.lr, iteration, gstate.spatial_lr_scale)
    # The non-finite guard (below) gates the Adam update in place: a
    # separate keep-old-vs-new select afterwards would be an extra full
    # read+write pass over params + both moments.
    finite = jnp.isfinite(loss)
    params, adam = optim.adam_update(ts.params, g_params, ts.adam, lrs,
                                     keep=finite)

    decoder, decoder_adam = ts.decoder, ts.decoder_adam
    if speedup:
        decoder, decoder_adam = optim.tensor_adam_update(
            ts.decoder, g_dec, ts.decoder_adam, lr=1e-4)

    gstate = density.add_densification_stats(
        gstate, g_offset, out.visibility, out.radii)

    # Failure detection (absent in the reference, SURVEY.md §5), device-side
    # so it works in pipelined (sync=False) training too: a non-finite loss
    # means non-finite gradients poisoning Adam moments and every later
    # step — discard the whole update and keep the previous state
    # (params/adam already gated inside adam_update). The host aborts on
    # persistent streaks at its sync points.
    def _keep(new, old):
        return jax.tree.map(lambda a, b: jnp.where(finite, a, b), new, old)

    gstate = _keep(gstate, ts.gstate)
    if speedup:
        decoder = _keep(decoder, ts.decoder)
        decoder_adam = _keep(decoder_adam, ts.decoder_adam)

    metrics = {
        "finite": finite,
        "loss": loss, "l1": ll1, "l1_feature": ll1_feat,
        "num_instances": out.total_instances,
        "max_tile_count": out.max_tile_count,
        "num_active": gstate.num_active,
        "psnr": L.psnr(jnp.clip(out.color, 0, 1), jnp.clip(gt_image, 0, 1)),
    }
    return TrainState(params=params, gstate=gstate, adam=adam,
                      decoder=decoder, decoder_adam=decoder_adam), metrics


@functools.partial(jax.jit, static_argnames=("ocfg", "use_screen_size_prune"))
def densify_step(ts: TrainState, key, extent, *, ocfg: OptimizationConfig,
                 use_screen_size_prune: bool):
    params, gstate, adam, report = density.densify_and_prune(
        ts.params, ts.gstate, ts.adam, key,
        max_grad=ocfg.densify_grad_threshold,
        min_opacity=ocfg.min_opacity,
        extent=extent,
        percent_dense=ocfg.percent_dense,
        use_screen_size_prune=use_screen_size_prune)
    return ts.replace(params=params, gstate=gstate, adam=adam), report


@jax.jit
def reset_opacity_step(ts: TrainState):
    params, adam = density.reset_opacity(ts.params, ts.adam)
    return ts.replace(params=params, adam=adam)


class Trainer:
    """Host-side orchestration (reference train.py training())."""

    def __init__(self, scene: SceneData, *, ocfg: OptimizationConfig = None,
                 rcfg: RasterConfig = None, max_sh_degree: int = 3,
                 feature_dim: int | None = None, speedup: bool = False,
                 white_background: bool = False, seed: int = 0,
                 capacity_headroom: float = 4.0,
                 gt_cache_bytes: int | None = None):
        self.scene = scene
        self.ocfg = ocfg or OptimizationConfig()
        self.rcfg = rcfg or RasterConfig()
        self.speedup = speedup
        self.max_sh_degree = max_sh_degree
        feature_dim = feature_dim if feature_dim is not None else scene.feature_dim
        self.feature_out_dim = feature_dim

        n = scene.points.shape[0]
        # Right-size the instance bucket to the scene (instance_capacity==0
        # means auto): freshly initialized Gaussians (KNN-scaled) touch
        # ~1-4 tiles each at the 32x16 tile default (measured 3.05/point
        # at op=0.5, ~2.2 with the opacity-aware rects at the op=0.1
        # init); start at ~3.5N and let the overflow re-jit grow it (one
        # ~3 min tunnel recompile, amortized over the run — capacity cost
        # is paid EVERY step: the 2.6x bucket the old 6N start picked was
        # ~15% of step time in slab-length XLA passes).
        if not self.rcfg.instance_capacity:
            tile_scale = 512 / (self.rcfg.tile_w * self.rcfg.tile_h)
            auto_cap = _round_capacity(
                max(1 << 17, int(3.5 * max(tile_scale, 1.0) * n)))
            self.rcfg = dataclasses.replace(
                self.rcfg, instance_capacity=auto_cap)
            print(f"[raster] auto instance capacity: {auto_cap} "
                  f"({n} points; grows on overflow)")
        capacity = _round_capacity(int(n * capacity_headroom))
        params, gstate = G.create_from_pcd(
            scene.points, scene.colors, max_sh_degree=max_sh_degree,
            feature_dim=feature_dim, speedup=speedup, capacity=capacity)
        gstate = gstate.replace(
            spatial_lr_scale=float(scene.nerf_norm["radius"]))
        self.extent = float(scene.nerf_norm["radius"])

        decoder = decoder_adam = None
        if speedup:
            decoder = init_decoder(feature_dim // 4, feature_dim, seed)
            decoder_adam = optim.init_tensor_adam(decoder)
        self.ts = TrainState(params=params, gstate=gstate,
                             adam=optim.init_adam(params), decoder=decoder,
                             decoder_adam=decoder_adam)
        self.bg = jnp.asarray(
            [1.0, 1.0, 1.0] if white_background else [0.0, 0.0, 0.0])
        self.white_background = white_background
        self.rng = random.Random(seed)
        self.key = jax.random.PRNGKey(seed)
        self.iteration = 0
        self._nonfinite_streak = 0
        self._pending_maintenance = None
        self._viewpoint_stack: list = []
        # GT device cache: LRU over (kind, uid) with an optional byte
        # budget (None = pin everything, the small-scene fast path).
        import collections
        self.gt_cache_bytes = gt_cache_bytes
        self._gt_cache: "collections.OrderedDict" = collections.OrderedDict()
        self._gt_bytes = 0
        self._next_cam = None
        # Densify reports awaiting a host read: capacity checks need host
        # scalars, but reading them inside the densify window costs a
        # blocked pipeline-draining RPC each (the measured ~4 s/window
        # long-run stall). Entries are (report, step_metrics) device trees;
        # _drain_reports folds them at sync points in ONE jax.device_get.
        self._pending_reports: list = []
        self._extent_dev = jnp.float32(self.extent)

    def restore_state(self, ts: TrainState) -> None:
        """Adopt a restored checkpoint TrainState (subclasses re-place it
        onto their mesh shardings)."""
        self.ts = ts

    def pick_camera(self):
        """Random-without-replacement epoch sampling (train.py:84-86)."""
        if not self._viewpoint_stack:
            self._viewpoint_stack = list(self.scene.train_cameras)
        return self._viewpoint_stack.pop(
            self.rng.randint(0, len(self._viewpoint_stack) - 1))

    def step(self, camera=None, sync: bool = True) -> dict:
        """One training iteration. With sync=False the returned metrics are
        device arrays (no host blocking — steps pipeline through the
        dispatch queue; call float() on them only when logging)."""
        # Density maintenance for the PREVIOUS iteration runs first: the
        # reference saves the scene PLY BEFORE the same-iteration densify/
        # opacity-reset (train.py:121-126 precede :129-140), so state
        # observed between step() calls must be pre-maintenance — otherwise
        # a model saved at an opacity_reset_interval boundary snapshots
        # freshly-zeroed opacities (a near-transparent, PSNR-7 scene).
        self.flush_maintenance()
        self.iteration += 1
        it = self.iteration
        if it % 1000 == 0:
            self.ts = self.ts.replace(gstate=G.one_up_sh_degree(
                self.ts.gstate, self.max_sh_degree))
        if camera is not None:
            cam = camera
        elif self._next_cam is not None:
            cam = self._next_cam
            self._next_cam = None
        else:
            cam = self.pick_camera()
        gt_image = self._device_cache(cam, "image")
        gt_feature = self._device_cache(cam, "feature")
        self.ts, metrics = train_step(
            self.ts, cam.to_view(), gt_image, gt_feature, self.bg,
            jnp.int32(it), ocfg=self.ocfg, rcfg=self.rcfg,
            speedup=self.speedup, max_sh_degree=self.max_sh_degree)
        if camera is None:
            # draw next epoch-sample NOW (same rng sequence, one step
            # early) and warm its cache: the upload overlaps this step's
            # device compute instead of serializing before the next one
            self._next_cam = self.pick_camera()
            self._device_cache(self._next_cam, "image")
            self._device_cache(self._next_cam, "feature")

        # Failure detection (absent in the reference, SURVEY.md section 5):
        # non-finite steps are discarded DEVICE-SIDE inside train_step (the
        # guard works pipelined; a blow-up mid-window can never poison Adam
        # moments). The host side only escalates: at sync points, repeated
        # non-finite observations mean training is stuck re-attempting from
        # the same state — abort.
        if sync:
            host_metrics, ok = self._sync_metrics(metrics, it, "trainer")
            if ok:
                self._pending_maintenance = (it, host_metrics)
            return host_metrics

        self._pending_maintenance = (it, metrics)
        return metrics

    def _sync_metrics(self, metrics, it: int, tag: str):
        """Blocking metrics read at a sync point, plus everything that
        should piggyback on an already-drained pipeline: folding pending
        densify reports and the capacity checks. Returns (host_metrics,
        finite)."""
        # ONE device_get for the whole metrics dict: each individual
        # float() is a separate blocked transfer (~100-200ms RPC on
        # tunneled TPUs, docs/tpu_notes.md)
        host_metrics = {k: float(v)
                        for k, v in jax.device_get(metrics).items()}
        if not host_metrics["finite"]:
            self._nonfinite_streak += 1
            print(f"[{tag}] non-finite loss at iteration {it} "
                  f"(streak {self._nonfinite_streak}); step discarded "
                  "on device")
            if self._nonfinite_streak >= 5:
                raise FloatingPointError(
                    f"loss non-finite at {self._nonfinite_streak} "
                    "consecutive sync points")
            return host_metrics, False
        self._nonfinite_streak = 0
        # The queue just drained: pending densify reports are long computed
        # and cost one extra round-trip here, vs a pipeline-stalling
        # blocked read inside the densify window (the measured ~4 s/window
        # long-run decay, docs/tpu_notes.md "Long-run CLI throughput").
        self._drain_reports()
        self._maybe_grow_raster(host_metrics)
        return host_metrics, True

    def flush_maintenance(self, drain: bool = False) -> None:
        """Apply the deferred densify/prune/opacity-reset for the last
        completed iteration (a no-op when nothing is pending). Call before
        saving FULL training checkpoints to match the reference's ordering
        (train.py:151-153 saves them post-densification); scene PLY saves
        must NOT call this.

        Dispatch-only: no host reads. Densify reports queue in
        ``_pending_reports`` and fold at the next sync point (or with
        ``drain=True``), so capacity growth lags the triggering window by
        at most one sync interval — densify grants fewer slots in the
        interim and recovers after the re-jit."""
        if self._pending_maintenance is not None:
            it, metrics = self._pending_maintenance
            self._pending_maintenance = None
            self._dispatch_maintenance(it, metrics)
        if drain:
            self._drain_reports()

    def _dispatch_maintenance(self, it: int, metrics) -> None:
        o = self.ocfg
        if it < o.densify_until_iter:
            if it > o.densify_from_iter and it % o.densification_interval == 0:
                sub, extent = self._densify_inputs()
                self.ts, report = densify_step(
                    self.ts, sub, extent, ocfg=o,
                    use_screen_size_prune=it > o.opacity_reset_interval)
                self._pending_reports.append((report, metrics))
            if it % o.opacity_reset_interval == 0 or (
                    self.white_background and it == o.densify_from_iter):
                self.ts = reset_opacity_step(self.ts)

    def _densify_inputs(self):
        self.key, sub = jax.random.split(self.key)
        return sub, self._extent_dev

    def _drain_reports(self) -> None:
        """Fold every queued densify report (+ its window's step metrics)
        into host capacity decisions with a single blocking transfer."""
        if not self._pending_reports:
            return
        batch = jax.device_get(self._pending_reports)
        self._pending_reports = []
        shortfall = max(int(r.wanted_slots) - int(r.granted_slots)
                        for r, _ in batch)
        if shortfall > 0:
            num_active = int(batch[-1][0].num_active)
            self._grow_params(_round_capacity(
                int((num_active + shortfall) * 1.5)))
        agg = {"num_instances": max(float(m["num_instances"])
                                    for _, m in batch)}
        with_mtc = [m for _, m in batch if "max_tile_count" in m]
        if with_mtc:
            agg["max_tile_count"] = max(float(m["max_tile_count"])
                                        for m in with_mtc)
        self._maybe_grow_raster(agg)

    def _device_cache(self, cam, kind: str):
        """GT tensors live in a byte-budgeted device LRU (unbounded when
        gt_cache_bytes is None). At reference scale each view's fp16 LSeg
        map is 100-200 MB (README.md:152) — pinning every view OOMs a
        16 GB chip near ~100 views, so over-budget views are evicted and
        re-uploaded asynchronously on their next epoch (the one-camera
        lookahead in step() overlaps that upload with the previous step's
        compute). Zero-fill of absent teacher maps is only reachable via
        load_scene(allow_missing_features=True); the loader raises
        otherwise (dataset_readers.py:110-112 semantics)."""
        key = (kind, cam.uid)
        entry = self._gt_cache.get(key)
        if entry is not None:
            self._gt_cache.move_to_end(key)
            return entry[0]
        if kind == "image":
            host = np.asarray(cam.image, np.float32)
        elif cam.semantic_feature is not None:
            host = np.asarray(cam.semantic_feature)  # fp16 maps stay fp16
            if host.dtype != np.float16:
                host = host.astype(np.float32)
        else:
            host = np.zeros((*cam.image.shape[:2], self.feature_out_dim),
                            np.float32)
        arr = jnp.asarray(host)
        self._gt_cache[key] = (arr, host.nbytes)
        self._gt_bytes += host.nbytes
        if self.gt_cache_bytes is not None:
            # keep >= 4 entries: the current AND prefetched camera's
            # image+feature pairs must coexist whatever the budget
            while (self._gt_bytes > self.gt_cache_bytes
                   and len(self._gt_cache) > 4):
                _, (_, nbytes) = self._gt_cache.popitem(last=False)
                self._gt_bytes -= nbytes
        return arr

    def _maybe_grow_raster(self, metrics):
        """Grow rasterizer capacities (re-jit) when binning overflows."""
        total = int(metrics["num_instances"])
        cfg = self.rcfg
        changed = False
        if total > 0.9 * cfg.instance_capacity:
            cfg = dataclasses.replace(
                cfg, instance_capacity=_round_capacity(int(total * 1.5)))
            changed = True
        # tile_capacity only bounds the XLA compositor's padded per-tile
        # lists; the Pallas kernels walk the flat sorted segments and ignore
        # it — growing it there would force a pointless full re-jit
        backend = cfg.backend
        if backend == "auto":
            backend = ("pallas" if jax.devices()[0].platform
                       in ("tpu", "axon") else "xla")
        if backend not in ("pallas", "pallas_interpret") \
                and "max_tile_count" in metrics:
            mtc = int(metrics["max_tile_count"])
            if mtc > cfg.tile_capacity:
                cfg = dataclasses.replace(
                    cfg, tile_capacity=_round_capacity(int(mtc * 1.3)))
                changed = True
        if changed:
            print(f"[raster] growing capacities -> instances "
                  f"{cfg.instance_capacity}, tile {cfg.tile_capacity}")
            self.rcfg = cfg

    def _grow_params(self, new_cap: int) -> None:
        """Re-jit the model at a larger static capacity (host decision made
        in _drain_reports from already-transferred report scalars)."""
        ts = self.ts
        if new_cap <= ts.params.capacity:
            return
        params, gstate, mu = G.grow_capacity(
            ts.params, ts.gstate, new_cap, ts.adam.mu)
        _, _, nu = G.grow_capacity(ts.params, ts.gstate, new_cap, ts.adam.nu)
        self.ts = ts.replace(
            params=params, gstate=gstate,
            adam=optim.AdamState(mu=mu, nu=nu, step=ts.adam.step))

    def train(self, iterations: int | None = None, log_every: int = 50,
              callback=None):
        n = iterations or self.ocfg.iterations
        history = []
        for _ in range(n):
            log = self.iteration + 1 >= n or (self.iteration + 1) % log_every == 0
            m = self.step(sync=log)
            if log:
                m = {k: float(v) for k, v in m.items()}
                history.append({"iteration": self.iteration, **m})
                if callback:
                    callback(self.iteration, m)
        return history


def _round_capacity(n: int) -> int:
    """Round up to the next 2^k or 1.5*2^k bucket (limits re-jits)."""
    n = max(n, 256)
    p = 1 << (n - 1).bit_length()
    return (p * 3) // 4 if n <= (p * 3) // 4 else p
