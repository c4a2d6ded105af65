"""feature3dgs_tpu — a TPU-native Feature 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Feature-3DGS
(CVPR 2024, ShijieZhou-UCLA/feature-3dgs): differentiable tile-based
rasterization of 3D Gaussians producing RGB + depth + N-dimensional semantic
feature maps in one pass, semantic-feature distillation training, density
control, editing, and downstream segmentation — built TPU-first:

  * compositing is formulated as chunked matmuls on the MXU (transmittance is
    a masked cumulative product along the chunk axis; color/feature
    accumulation and their gradients are pix×K×C contractions),
  * binning replaces the CUDA radix sort with a lexicographic
    ``jax.lax.sort`` over (tile, depth) keys and static-capacity padded
    per-tile lists,
  * multi-chip scaling shards the tile grid / camera batch over a
    ``jax.sharding.Mesh`` with psum gradient reduction,
  * everything in the step is jittable with static shapes.

Layer map (mirrors SURVEY.md §1 of the reference):
  core/      pure math: SH, camera transforms, EWA projection
  ops/       rasterizer: binning, compositing (custom_vjp), oracle, Pallas
  model/     Gaussian parameter pytree, optimizer, density control, PLY I/O
  data/      COLMAP / Blender readers, cameras, teacher feature maps
  train/     losses, train step, checkpointing
  render/    batch rendering, render modes, PCA vis, editing
  tasks/     segmentation / metrics / CLIP glue
  parallel/  mesh + sharded render/train
  viewer/    SIBR-compatible TCP protocol server
  native/    C++ helpers (KNN init, COLMAP parsing) with numpy fallbacks
"""

__version__ = "0.1.0"
