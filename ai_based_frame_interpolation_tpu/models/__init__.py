from .flow import FlowInterpolator  # noqa: F401
from .tower import TowerInterpolator  # noqa: F401
from .unet import (DoubleConv, Down, FrameInterpolationUNet, UNet, Up,  # noqa: F401
                   count_parameters, fold_batchnorm, init_variables)

# model-family registry: ModelConfig.arch -> module class
MODEL_REGISTRY = {
    "unet": FrameInterpolationUNet,
    "tower": TowerInterpolator,
    "flow": FlowInterpolator,
}


def build_model(cfg, compute_dtype=None, folded=False):
    """Construct the configured model family."""
    import jax.numpy as jnp

    cls = MODEL_REGISTRY[cfg.arch]
    return cls(cfg=cfg, compute_dtype=compute_dtype or jnp.bfloat16,
               folded=folded)
