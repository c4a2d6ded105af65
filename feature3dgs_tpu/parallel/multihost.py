"""Multi-host (multi-process) training: the ladder's ">= 2 hosts" rung.

The reference is single-GPU (SURVEY.md section 2.4, hard-coded cuda:0 at
/root/reference/utils/general_utils.py:133); this is the TPU-native
scale-out design on top of ``DistributedTrainer``:

  * ``distributed.initialize()`` wires the multi-process runtime;
    ``distributed.make_host_chip_mesh()`` places the ``data`` axis across
    HOSTS and the ``tile`` axis across each host's local chips, so the
    per-step gradient psum crosses DCN once while tile-sharded render
    traffic rides ICI.
  * Every process holds a bitwise-identical REPLICATED TrainState (global
    jax.Arrays over the whole mesh); the jitted steps are multi-controller
    SPMD programs every process enters in lockstep.
  * GT images / teacher feature maps are HOST-LOCAL: each process uploads
    only the cameras of its own data rows (the multi-GB per-view LSeg maps
    of /root/reference/README.md:152 never cross hosts), assembled into
    global batch arrays with ``jax.make_array_from_process_local_data``.
  * Host-side maintenance (densify/prune/reset, capacity growth) runs the
    same jitted replicated programs; capacity growth round-trips through
    host numpy (it reshapes buffers, which eager multi-process ops cannot).

Camera schedule: each data row d of the mesh draws from its own contiguous
camera stripe (``distributed.local_camera_indices``) with an independent
seeded RNG, so processes never need each other's image files. All
cross-host agreement is over jitted array programs, never filenames.
"""
from __future__ import annotations

import functools
import random

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from feature3dgs_tpu.data.dataset import SceneData
from feature3dgs_tpu.parallel import distributed
from feature3dgs_tpu.parallel.trainer import DistributedTrainer


class MultiHostTrainer(DistributedTrainer):
    """DistributedTrainer whose process only materializes its own shard.

    Works single-process too (degenerates to DistributedTrainer semantics
    with stripe-partitioned camera sampling) — the 2-process CPU parity
    test relies on that equivalence.
    """

    _sync_tag = "multihost-trainer"

    def __init__(self, scene: SceneData, *, mesh: jax.sharding.Mesh,
                 cameras_per_step: int | None = None, **kwargs):
        # Until the end of __init__ the TrainState is host/process-local;
        # the _grow_params/_place_state overrides below stay in host mode
        # while this is False and the global placement happens exactly once.
        self._mh_global = False
        self._replicated = NamedSharding(mesh, P())
        self._data_sharded = NamedSharding(mesh, P("data"))
        super().__init__(scene, mesh=mesh,
                         cameras_per_step=cameras_per_step, **kwargs)
        # Re-materialize the TrainState as GLOBAL arrays spanning the whole
        # (possibly multi-process) mesh: capacity-leading rows sharded over
        # all devices when shard_gaussians, everything replicated otherwise.
        # jax.device_put of host numpy slices process-locally, so this works
        # from every controller — the state is constructed deterministically
        # (same seed) everywhere.
        host_ts = jax.device_get(self.ts)
        self._mh_global = True
        self.ts = self._pin(host_ts)
        self.bg = jax.device_put(np.asarray(self.bg), self._replicated)

        # Per-data-row camera stripes + per-row RNGs: row d samples
        # random-without-replacement epochs from stripe d only (the
        # multi-host analog of train.py:84-86). Seeds derive from the
        # shared seed + row index so runs are reproducible and all
        # processes could recompute any row's schedule.
        n_cams = len(scene.train_cameras)
        if n_cams < self.n_data:
            raise ValueError(
                f"{n_cams} cameras < data axis {self.n_data}; every data "
                "row needs a non-empty camera stripe")
        seed = kwargs.get("seed", 0)
        self._stripes = []
        self._row_rngs = []
        self._row_stacks: list[list] = []
        for d in range(self.n_data):
            idx = distributed.stripe_indices(n_cams, d, self.n_data)
            self._stripes.append(idx)
            self._row_rngs.append(random.Random(seed * 7919 + d))
            self._row_stacks.append([])
        # rows this PROCESS owns (whose images/fmaps it must have on disk)
        self._local_rows = sorted({
            _row_of_device(mesh, dev) for dev in mesh.local_devices})
        # Byte-budgeted host LRU (reuse the Trainer's gt_cache_bytes knob,
        # --gt_cache_mb): epoch reshuffling makes batch keys essentially
        # unique, so an unbounded cache OOMs within a few epochs at
        # reference-scale LSeg maps (100-200 MB/view). Keyed per camera
        # uid; the batch-level device arrays are rebuilt every step (a
        # batch-keyed device LRU held only dead arrays, round-3 VERDICT).
        import collections
        self._host_gt_cache: "collections.OrderedDict" = \
            collections.OrderedDict()
        self._host_gt_bytes = 0

    # -- state placement / restore -----------------------------------------

    def _pin(self, ts):
        """Place a state tree (host numpy or global arrays) onto this
        trainer's shardings: capacity-leading leaves row-sharded when
        shard_gaussians, everything else replicated. jax>=0.9 device_put
        handles both numpy->global and global->global cross-process."""
        if self.shard_gaussians:
            return self._place_state(ts)
        return jax.device_put(ts, self._replicated)

    def _place_state(self, ts):
        if not self._mh_global:
            return ts  # __init__-time: placement happens once at the end
        return super()._place_state(ts)

    def restore_state(self, ts) -> None:
        """Adopt a restored host-side TrainState as global arrays (capacity
        rounded up to a device multiple when gaussian-sharded). Every
        process must call this with the same checkpoint."""
        host_ts = jax.device_get(ts)
        if self.shard_gaussians:
            cap = host_ts.params.capacity
            new_cap = -(-cap // self._cap_mult) * self._cap_mult
            if new_cap > cap:
                host_ts = _host_pad_state(host_ts, cap, new_cap)
        self.ts = self._pin(host_ts)

    def replicate_state(self, ts):
        """Back-compat alias of restore_state (returns the placed state)."""
        self.restore_state(ts)
        return self.ts

    # -- camera schedule ---------------------------------------------------

    def pick_row_camera(self, d: int) -> int:
        """Epoch sampling without replacement within stripe d."""
        if not self._row_stacks[d]:
            self._row_stacks[d] = list(self._stripes[d])
        stack = self._row_stacks[d]
        return stack.pop(self._row_rngs[d].randint(0, len(stack) - 1))

    def pick_batch(self) -> list[int]:
        """Global camera-uid batch for one step, stripe-partitioned:
        batch position k belongs to data row k % n_data."""
        b_loc = self.batch // self.n_data
        out = []
        for i in range(b_loc):
            for d in range(self.n_data):
                out.append(self.pick_row_camera(d))
        return out

    # -- sharded GT assembly ----------------------------------------------

    def _host_gt(self, uid: int):
        """(image, feature) numpy pair for a LOCAL camera, cached on host
        under the byte budget."""
        entry = self._host_gt_cache.get(uid)
        if entry is not None:
            self._host_gt_cache.move_to_end(uid)
            return entry
        cam = self.scene.train_cameras[uid]
        if cam.image is None:
            raise RuntimeError(
                f"camera uid {uid} ({cam.image_name}) has no pixel data on "
                "this process — it belongs to another host's stripe "
                "(host-local loading, distributed.local_camera_indices); "
                "a multi-host batch must only route stripe-local cameras "
                "here")
        img = np.asarray(cam.image, np.float32)
        if cam.semantic_feature is not None:
            feat = np.asarray(cam.semantic_feature)  # fp16 maps stay fp16
            if feat.dtype != np.float16:
                feat = feat.astype(np.float32)
        else:
            # f32 zero-fill (allow_missing_features only). Caveat: an fp16
            # dataset whose missing maps all land on one host's stripe
            # yields per-process dtype mismatch in the global batch — that
            # fails LOUDLY in make_array_from_process_local_data, never
            # silently
            feat = np.zeros((*img.shape[:2], self.feature_out_dim),
                            np.float32)
        self._host_gt_cache[uid] = (img, feat)
        self._host_gt_bytes += img.nbytes + feat.nbytes
        if self.gt_cache_bytes is not None:
            while (self._host_gt_bytes > self.gt_cache_bytes
                   and len(self._host_gt_cache) > 2):
                _, (i, f) = self._host_gt_cache.popitem(last=False)
                self._host_gt_bytes -= i.nbytes + f.nbytes
        return img, feat

    def _global_batch(self, uids: list[int]):
        """Build the [B,...] global arrays for a batch, uploading only the
        data rows this process owns. Rebuilt every step from the uid-keyed
        host cache: a batch-keyed device LRU would hold only dead arrays
        (epoch reshuffling makes exact batch repeats rare)."""
        views = [self.scene.train_cameras[uid].to_view() for uid in uids]
        # Batch position k belongs to data row k % n_data, but P('data')
        # shards axis 0 in contiguous blocks — permute the batch to
        # [row0 cams..., row1 cams...] so each row's cameras land on its
        # devices; the local stack follows the same permutation restricted
        # to this process's rows.
        order = [k for d in range(self.n_data)
                 for k in range(d, self.batch, self.n_data)]
        views = [views[k] for k in order]
        local_imgs, local_feats = [], []
        for k in order:
            if k % self.n_data in self._local_rows:
                img, feat = self._host_gt(uids[k])
                local_imgs.append(img)
                local_feats.append(feat)
        gt_images = jax.make_array_from_process_local_data(
            self._data_sharded, np.stack(local_imgs))
        gt_features = jax.make_array_from_process_local_data(
            self._data_sharded, np.stack(local_feats))
        # camera arrays are tiny — replicate them (every process knows every
        # camera's geometry; only bulky pixel/feature data stays host-local)
        cam_arrays = {
            k: jax.device_put(np.stack([np.asarray(getattr(v, f))
                                        for v in views]), self._replicated)
            for k, f in (("view", "view"), ("proj", "proj"),
                         ("campos", "campos"), ("tan_fovx", "tan_fovx"),
                         ("tan_fovy", "tan_fovy"))}
        return cam_arrays, gt_images, gt_features

    # -- step: DistributedTrainer.step with multi-host batch assembly ------

    def _assemble_batch(self, cameras):
        """``cameras`` here is a list of camera UIDs (stripe-sampled when
        None); GT pixels upload process-locally (_global_batch)."""
        uids = list(cameras) if cameras is not None else self.pick_batch()
        return self._global_batch(uids)

    # -- maintenance overrides for multi-process safety --------------------
    # The schedule itself is DistributedTrainer._dispatch_maintenance;
    # only the densify inputs and capacity growth need multi-process forms.

    def _densify_inputs(self):
        """Densify key/extent as HOST values: a committed single-device
        array fed to a multi-process jit raises a device-assignment
        error."""
        self.key, sub = jax.random.split(self.key)
        return np.asarray(sub), np.float32(self.extent)

    def _grow_params(self, new_cap: int) -> None:
        """Capacity growth in a lockstep jitted program over the GLOBAL
        state (a row-sharded cross-process TrainState is not fully
        addressable, so no host round-trip is possible — and none is
        needed). Rare (capacities are 2^k-bucketed); every process reaches
        the same decision from the same replicated report scalars."""
        if self.shard_gaussians:
            new_cap = -(-new_cap // self._cap_mult) * self._cap_mult
        old = self.ts.params.capacity
        if new_cap <= old:
            return
        if not self._mh_global:
            # __init__/restore time: the state is still host/process-local
            # (global placement happens once at the end of __init__)
            self.ts = _host_pad_state(jax.device_get(self.ts), old, new_cap)
            return
        self.ts = self._pin(_pad_state_jit(self.ts, old=old, new_cap=new_cap))


def _host_pad_state(host_ts, old: int, new_cap: int):
    """Zero-pad capacity-leading leaves of a HOST state tree to new_cap
    (params/gstate/adam only — decoder dims must never be confused with a
    coincidentally equal capacity)."""

    def pad(x):
        if not hasattr(x, "ndim") or x.ndim == 0 or x.shape[0] != old:
            return x
        padded = np.zeros((new_cap,) + x.shape[1:], x.dtype)
        padded[:old] = x
        return padded

    return host_ts.replace(params=jax.tree.map(pad, host_ts.params),
                           gstate=jax.tree.map(pad, host_ts.gstate),
                           adam=jax.tree.map(pad, host_ts.adam))


@functools.partial(jax.jit, static_argnames=("old", "new_cap"))
def _pad_state_jit(ts, *, old: int, new_cap: int):
    """SPMD capacity pad: every process enters in lockstep; works on
    replicated AND row-sharded global TrainStates (the caller re-pins the
    output shardings)."""

    def pad(x):
        if x.ndim == 0 or x.shape[0] != old:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((new_cap - old,) + x.shape[1:], x.dtype)], axis=0)

    return ts.replace(params=jax.tree.map(pad, ts.params),
                      gstate=jax.tree.map(pad, ts.gstate),
                      adam=jax.tree.map(pad, ts.adam))


def worker_main(argv=None):
    """Standalone multi-host training worker (tests + dryrun 2-process
    phase): initialize the distributed runtime from env, train a
    deterministic synthetic scene on an explicit (data x tile) mesh, and
    have process 0 dump the final replicated parameters.

    Run as: python -m feature3dgs_tpu.parallel.multihost --data 2 --tile 4 \
        --iters 60 --out /tmp/out.npz
    (with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set
    for multi-process; unset = single-process.)
    """
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=int, required=True)
    p.add_argument("--tile", type=int, required=True)
    p.add_argument("--iters", type=int, default=60)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shard_gaussians", action="store_true",
                   help="row-shard params/Adam/densify stats over all mesh "
                        "devices (SURVEY 2.4 row 2) under multi-host")
    args = p.parse_args(argv)

    distributed.initialize()  # must precede any backend-touching jax call
    from feature3dgs_tpu.data.synthetic import synthetic_scene
    from feature3dgs_tpu.ops import RasterConfig
    from feature3dgs_tpu.parallel.sharded import make_mesh
    from feature3dgs_tpu.train.trainer import OptimizationConfig

    mesh = make_mesh((args.data, args.tile), ("data", "tile"))
    scene = synthetic_scene(n_cams=4, w=64, h=48, n_pts=256, f_dim=8, seed=1)
    ocfg = OptimizationConfig(
        iterations=args.iters, densify_from_iter=6,
        densification_interval=20, densify_until_iter=10_000,
        opacity_reset_interval=40, densify_grad_threshold=1e-8)
    rcfg = RasterConfig(instance_capacity=1 << 12, tile_capacity=1 << 8,
                        chunk=16, backend="xla")
    trainer = MultiHostTrainer(scene, mesh=mesh, ocfg=ocfg, rcfg=rcfg,
                               max_sh_degree=2, capacity_headroom=1.2,
                               seed=args.seed,
                               shard_gaussians=args.shard_gaussians)
    cap0 = trainer.ts.params.capacity
    with jax.set_mesh(mesh):
        history = trainer.train(iterations=args.iters, log_every=20)
        final = history[-1]
        ts_full = trainer.ts
        if args.shard_gaussians:
            # a row-sharded cross-process state is not fully addressable:
            # gather to replicated before reading it on the host
            n_dev = mesh.devices.size
            shard_rows = (trainer.ts.params.xyz
                          .addressable_shards[0].data.shape[0])
            assert shard_rows == trainer.ts.params.capacity // n_dev, (
                shard_rows, trainer.ts.params.capacity, n_dev)
            ts_full = jax.device_put(ts_full, NamedSharding(mesh, P()))
    host_ts = jax.device_get(ts_full)
    n_active = int(host_ts.gstate.alive.sum())
    assert np.isfinite(final["loss"]), final
    assert n_active > 256, f"densification never grew the model ({n_active})"
    assert trainer.ts.params.capacity > cap0, "capacity growth never fired"
    if jax.process_index() == 0 and args.out:
        np.savez(args.out,
                 xyz=host_ts.params.xyz, opacity=host_ts.params.opacity,
                 scaling=host_ts.params.scaling,
                 semantic_feature=host_ts.params.semantic_feature,
                 alive=host_ts.gstate.alive,
                 loss=np.float32(final["loss"]),
                 capacity=np.int32(host_ts.params.capacity))
    print(f"MULTIHOST WORKER OK: process {jax.process_index()}/"
          f"{jax.process_count()} mesh=({args.data}x{args.tile}) "
          f"iters={trainer.iteration} active={n_active} "
          f"loss={final['loss']:.5f}")


def _row_of_device(mesh: jax.sharding.Mesh, dev) -> int:
    """Index of `dev` along the mesh's first ('data') axis."""
    arr = np.asarray(mesh.devices)
    pos = np.argwhere(arr == dev)
    return int(pos[0][0])


if __name__ == "__main__":
    worker_main()
