from .torch_import import import_reference_unet_state  # noqa: F401
