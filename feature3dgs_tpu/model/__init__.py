from feature3dgs_tpu.model.gaussians import GaussianParams, GaussianState  # noqa: F401
