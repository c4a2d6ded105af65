"""Distributed training orchestration: the Trainer analog over a device
mesh.

The reference is strictly single-GPU (SURVEY.md §2.4); this is a new
TPU-native design. ``DistributedTrainer`` reuses the single-device
``Trainer``'s host-side schedule logic (SH bumps, densify/prune/opacity
reset cadence, capacity growth re-jits, GT caching) and swaps the jitted
step for ``parallel.sharded.sharded_train_step``: per step it consumes a
batch of ``mesh.shape['data']`` cameras (each counted as one reference
iteration, train.py:84-91) rendered tile-sharded over ``mesh.shape['tile']``
devices, with gradients psum'ed across the whole mesh.

Densification runs replicated: the mesh step folds the psum'ed ndc
gradients / visibility union / max radii into ``gstate`` exactly like the
single-device step, so the same jitted ``densify_step`` /
``reset_opacity_step`` (operating on replicated arrays) keeps every
device's parameters identical — the TPU-native equivalent of the
reference's in-place optimizer surgery (gaussian_model.py:285-355) under
SPMD.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from feature3dgs_tpu.data.dataset import SceneData
from feature3dgs_tpu.parallel.sharded import sharded_train_step, stack_cameras
from feature3dgs_tpu.train.trainer import Trainer


class DistributedTrainer(Trainer):
    """Mesh-parallel Trainer: batches ``n_data`` cameras per jitted step.

    The iteration counter advances by the camera-batch size so the
    reference's per-iteration schedule (densify every 100, opacity reset
    every 3000, LR decay per iteration) keeps its meaning; the batch loss
    is the mean of per-camera reference losses.
    """

    def __init__(self, scene: SceneData, *, mesh: jax.sharding.Mesh,
                 cameras_per_step: int | None = None,
                 shard_gaussians: bool = False,
                 shard_instances: bool = False, **kwargs):
        super().__init__(scene, **kwargs)
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        # Gaussian-sharded O(N) stages via the tile-owner instance exchange
        # (sharded._make_exchange_loss_fn); requires shard_gaussians.
        self.shard_instances = shard_instances
        self.batch = cameras_per_step or self.n_data
        if self.batch % self.n_data:
            raise ValueError(
                f"cameras_per_step {self.batch} not divisible by the data "
                f"axis {self.n_data}")
        # Gaussian-axis sharding (SURVEY §2.4 row 2): params, Adam moments
        # and densify stats live row-sharded over ALL mesh devices; the
        # render gathers them transiently and gradients reduce-scatter
        # back (sharded.sharded_train_step). Memory per device for the
        # model+optimizer state drops ~n_dev-fold; results stay within
        # collective-reassociation float drift of the replicated baseline.
        self.shard_gaussians = shard_gaussians
        if shard_gaussians:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._cap_mult = int(mesh.devices.size)
            self._gauss_sharding = NamedSharding(mesh, P(("data", "tile")))
            self._repl_sharding = NamedSharding(mesh, P())
            # equal row shards per device (shard_map spec): pad capacity up
            # to a device multiple, then pin the initial placement
            self._grow_params(self.ts.params.capacity)
            self.ts = self._place_state(self.ts)

    def _grow_params(self, new_cap: int) -> None:
        if not self.shard_gaussians:
            return super()._grow_params(new_cap)
        new_cap = -(-new_cap // self._cap_mult) * self._cap_mult
        super()._grow_params(new_cap)
        self.ts = self._place_state(self.ts)

    def _place_state(self, ts):
        """Pin capacity-leading leaves to the Gaussian row sharding and
        everything else replicated (no-op on already-placed arrays).

        Called after every host-side state surgery (growth, densify, reset):
        those jitted ops carry no sharding annotations, so GSPMD may emit
        outputs with drifted layouts; re-pinning keeps sharded_train_step's
        input shardings stable across calls (no reshard/recompile churn)."""
        cap = ts.params.capacity

        def put(x):
            if hasattr(x, "ndim") and x.ndim and x.shape[0] == cap:
                return jax.device_put(x, self._gauss_sharding)
            return jax.device_put(x, self._repl_sharding)
        return jax.tree.map(put, ts)

    _sync_tag = "dist-trainer"

    def restore_state(self, ts) -> None:
        """Adopt a restored TrainState; under --shard_gaussians the
        capacity is rounded up to a device multiple and the leaves pinned
        to the row sharding (a raw checkpoint is host-shaped)."""
        self.ts = ts
        if self.shard_gaussians:
            self._grow_params(ts.params.capacity)  # rounds up + re-places
            self.ts = self._place_state(self.ts)

    def _assemble_batch(self, cameras):
        """(cam_arrays, gt_images, gt_features) for one step's batch.
        ``cameras`` is a list of Camera objects (or None to sample).
        MultiHostTrainer overrides this with stripe-sampled uids +
        process-local GT upload — everything else in step() is shared."""
        cams = (list(cameras) if cameras is not None
                else [self.pick_camera() for _ in range(self.batch)])
        gt_images = jnp.stack([self._device_cache(c, "image") for c in cams])
        gt_features = jnp.stack(
            [self._device_cache(c, "feature") for c in cams])
        return stack_cameras([c.to_view() for c in cams]), gt_images, \
            gt_features

    def step(self, cameras=None, sync: bool = True) -> dict:
        """One mesh step over a camera batch (counts as ``batch``
        reference iterations)."""
        self.flush_maintenance()
        it0 = self.iteration + 1
        self.iteration += self.batch
        for it in range(it0, self.iteration + 1):
            if it % 1000 == 0:
                from feature3dgs_tpu.model import gaussians as G
                self.ts = self.ts.replace(gstate=G.one_up_sh_degree(
                    self.ts.gstate, self.max_sh_degree))
        cam_arrays, gt_images, gt_features = self._assemble_batch(cameras)

        # per-camera iteration span: the xyz LR decay and every constant
        # group fold the reference's per-iteration schedule over the whole
        # batch (group_lrs docstring; train.py:77-81). Host numpy: a
        # committed single-device array would trip multi-process jits.
        its = np.arange(it0, it0 + self.batch, dtype=np.int32)
        self.ts, metrics = sharded_train_step(
            self.ts, cam_arrays, gt_images, gt_features, self.bg,
            its, mesh=self.mesh, ocfg=self.ocfg, rcfg=self.rcfg,
            speedup=self.speedup, max_sh_degree=self.max_sh_degree,
            shard_gaussians=self.shard_gaussians,
            shard_instances=self.shard_instances)

        if sync:
            host_metrics, ok = self._sync_metrics(metrics, self.iteration,
                                                  self._sync_tag)
            if ok:
                self._pending_maintenance = (self.iteration, host_metrics)
            return host_metrics

        self._pending_maintenance = (self.iteration, metrics)
        return metrics

    def _dispatch_maintenance(self, it: int, metrics) -> None:
        """Densify/prune/opacity-reset for the completed batch, dispatch-
        only (reports fold at sync points, see Trainer.flush_maintenance).
        With batch size B the schedule triggers when the interval boundary
        falls inside the batch's iteration span (the reference checks
        ``it % interval == 0`` per camera-iteration)."""
        o = self.ocfg
        b = self.batch
        span = range(it - b + 1, it + 1)

        def hits(interval):
            return any(i % interval == 0 for i in span)

        if it - b + 1 < o.densify_until_iter:
            if it > o.densify_from_iter and hits(o.densification_interval):
                from feature3dgs_tpu.train.trainer import densify_step
                sub, extent = self._densify_inputs()
                self.ts, report = densify_step(
                    self.ts, sub, extent, ocfg=o,
                    use_screen_size_prune=it > o.opacity_reset_interval)
                self._pending_reports.append((report, metrics))
            if hits(o.opacity_reset_interval) or (
                    self.white_background
                    and it - b + 1 <= o.densify_from_iter <= it):
                from feature3dgs_tpu.train.trainer import reset_opacity_step
                self.ts = reset_opacity_step(self.ts)
            if self.shard_gaussians:
                self.ts = self._place_state(self.ts)

    def train(self, iterations: int | None = None, log_every: int = 50,
              callback=None):
        n = iterations or self.ocfg.iterations
        history = []
        while self.iteration < n:
            nxt = self.iteration + self.batch
            log = nxt >= n or (nxt // log_every) > (self.iteration // log_every)
            m = self.step(sync=log)
            if log:
                m = {k: float(v) for k, v in m.items()}
                history.append({"iteration": self.iteration, **m})
                if callback:
                    callback(self.iteration, m)
        return history
