from . import noise, simplex  # noqa: F401
