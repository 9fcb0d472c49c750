from . import geometry, image  # noqa: F401
