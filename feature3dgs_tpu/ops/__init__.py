from feature3dgs_tpu.ops.rasterize import (  # noqa: F401
    RasterConfig,
    RasterOutput,
    mark_visible,
    rasterize,
    rasterize_batch,
)
