"""Dataset registry: name -> (option_setter, factory), mirroring
/root/reference/data/__init__.py:18-47 without importlib magic."""

from __future__ import annotations

_REGISTRY: dict = {}


def register_dataset(name: str, factory, option_setter=None):
    _REGISTRY[name] = (factory, option_setter or (lambda parser, is_train: parser))


def get_option_setter(name: str):
    _ensure_builtin()
    if name not in _REGISTRY:
        raise KeyError(f"unknown dataset '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name][1]


def create_dataset(opt):
    _ensure_builtin()
    factory = _REGISTRY[opt.dataset_mode][0]
    dataset = factory(opt)
    print(f"dataset [{type(dataset).__name__}] was created")
    return dataset


def _ensure_builtin():
    if "aligned" not in _REGISTRY:
        from . import aligned  # noqa: F401
    if "synthetic" not in _REGISTRY:
        from . import synthetic  # noqa: F401
