from . import ssim_fused  # noqa: F401
