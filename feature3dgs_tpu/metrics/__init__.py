from feature3dgs_tpu.metrics.lpips_jax import (  # noqa: F401
    lpips_available,
    lpips_distance,
    load_lpips_weights,
)
