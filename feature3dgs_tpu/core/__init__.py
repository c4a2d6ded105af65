from feature3dgs_tpu.core import sh, transforms, projection  # noqa: F401
