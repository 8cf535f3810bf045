from .unet import (DoubleConv, Down, FrameInterpolationUNet, UNet, Up,
                   count_parameters, init_variables)  # noqa: F401
