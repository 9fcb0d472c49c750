"""Model registry: name -> (option_setter, factory).

TPU-native equivalent of the reference's importlib discovery
(/root/reference/models/__init__.py:25-45): models register a CLI flag
injector and a constructor; `create_model(opt)` builds the train/infer state.
"""

from __future__ import annotations

_REGISTRY: dict = {}


def register_model(name: str, factory, option_setter=None):
    _REGISTRY[name] = (factory, option_setter or (lambda parser, is_train: parser))


def get_option_setter(name: str):
    _ensure_builtin()
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name][1]


def create_model(opt):
    _ensure_builtin()
    factory = _REGISTRY[opt.model][0]
    model = factory(opt)
    print(f"model [{type(model).__name__}] was created")
    return model


def _ensure_builtin():
    if "pix2pix" not in _REGISTRY:
        from . import pix2pix  # noqa: F401  (registers itself on import)
