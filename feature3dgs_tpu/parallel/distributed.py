"""Multi-host initialization and mesh construction.

The reference has no distributed support at all (SURVEY.md section 2.4:
single hard-coded ``cuda:0``, no torch.distributed/NCCL anywhere). This
module is the TPU-native communication backend for scaling past one host:

  * ``jax.distributed.initialize()`` wires up the multi-host runtime (each
    host sees only its local chips; collectives span all of them).
  * The mesh places the ``data`` axis across HOSTS (camera batches are
    host-local work whose gradient all-reduce crosses DCN once per step)
    and the ``tile`` axis across the chips WITHIN a host, so the per-tile
    gather/psum traffic of the sharded rasterizer rides ICI.
  * Per-view teacher feature maps (100-200MB each, README.md:152) are
    loaded host-locally for the cameras that host owns.

Single-process multi-device (one host, N chips) needs no initialize() call;
``make_host_chip_mesh`` degenerates to a (1, N) mesh.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Idempotent ``jax.distributed.initialize`` with env fallbacks.

    On TPU pods the arguments are discovered automatically from the
    metadata server; on other setups pass them or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    # IMPORTANT: touch no backend-initializing jax API (jax.process_count,
    # jax.devices, ...) before jax.distributed.initialize — doing so makes
    # initialize() unconditionally raise 'must be called before any JAX
    # calls'. Idempotency is checked against the distributed client state
    # instead.
    try:
        from jax._src import distributed as _dist  # internal, but the only
        if _dist.global_state.client is not None:  # pre-backend probe
            return  # already initialized
    except (ImportError, AttributeError):
        # private API moved across a JAX upgrade — fall through and let
        # initialize() itself report "already initialized" (classified as
        # benign below)
        pass
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
        kwargs["process_id"] = int(
            process_id or os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        # explicit multi-host configuration must fail loudly
        if addr or os.environ.get("JAX_NUM_PROCESSES"):
            raise
        msg = str(e).lower()
        if "already" in msg or "before any jax" in msg:
            return  # someone (a library import) initialized things first
        if isinstance(e, ValueError):
            # single-process runs (tests, one-host dev): auto-detect has no
            # coordinator/metadata to discover — benign
            return
        # a RuntimeError from pod auto-detect means this probably IS a
        # multi-host environment whose init failed; proceeding would let
        # every host train independently and clobber the model_path
        raise


def make_host_chip_mesh(axis_names=("data", "tile")) -> jax.sharding.Mesh:
    """Mesh with hosts on the first axis and each host's local chips on the
    second — dp gradient psum crosses DCN, tile-sharded render traffic
    stays on ICI."""
    n_hosts = jax.process_count()
    devs = jax.devices()
    per_host = len(devs) // n_hosts
    # jax.devices() orders by process index, so a (hosts, per_host) reshape
    # puts each row on one host's ICI domain
    arr = np.asarray(devs).reshape(n_hosts, per_host)
    return jax.sharding.Mesh(arr, tuple(axis_names))


def stripe_indices(num_items: int, row: int, n_rows: int) -> list[int]:
    """Balanced contiguous partition: the first ``num_items % n_rows``
    stripes get one extra item, so every stripe is non-empty whenever
    ``num_items >= n_rows``. (Ceil division can leave TRAILING rows empty —
    6 items over 4 rows gives [2,2,2,0] — which crashes epoch sampling on
    the empty stripe instead of the intended init-time error.)

    The single stripe convention for both host-local data loading and the
    per-data-row camera schedule (multihost.MultiHostTrainer)."""
    q, r = divmod(num_items, n_rows)
    start = row * q + min(row, r)
    return list(range(start, start + q + (1 if row < r else 0)))


def local_camera_indices(num_cameras: int) -> list[int]:
    """The camera subset this host loads (and whose feature maps it reads
    from local disk): a contiguous stripe by process index."""
    return stripe_indices(num_cameras, jax.process_index(),
                          jax.process_count())
