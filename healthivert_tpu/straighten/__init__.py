from .curve import Interpolator, frenet_serret, sagittal_basis  # noqa: F401
