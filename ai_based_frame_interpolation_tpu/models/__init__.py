from .flow import FlowInterpolator  # noqa: F401
from .tower import TowerInterpolator  # noqa: F401
from .unet import (DoubleConv, Down, FrameInterpolationUNet, UNet, Up,  # noqa: F401
                   count_parameters, fold_batchnorm, init_variables,
                   tile_params_packed)

# model-family registry: ModelConfig.arch -> module class
MODEL_REGISTRY = {
    "unet": FrameInterpolationUNet,
    "tower": TowerInterpolator,
    "flow": FlowInterpolator,
}


def build_model(cfg, compute_dtype=None, folded=False, pack=1):
    """Construct the configured model family.

    ``pack`` > 1 builds the batch-to-channel packed inference variant of the
    unet family (grouped convs over ``pack`` batch items folded into
    channels — see ``models.unet.pack_batch``); requires ``folded=True`` and
    weights tiled by ``tile_params_packed``.
    """
    import jax.numpy as jnp

    cls = MODEL_REGISTRY[cfg.arch]
    kwargs = {}
    if pack > 1:
        if cfg.arch != "unet":
            raise ValueError("pack > 1 is a unet-family option")
        kwargs["pack"] = pack
    return cls(cfg=cfg, compute_dtype=compute_dtype or jnp.bfloat16,
               folded=folded, **kwargs)
