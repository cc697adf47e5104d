from .unet import UNet, unet_from_args  # noqa: F401
from .ema import ema_update, init_ema  # noqa: F401
