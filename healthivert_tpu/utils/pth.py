"""No-torch reader for PyTorch ``.pth`` checkpoints + name mapping into the
flax Generator parameter tree.

The reference loads released weights through torch state dicts
(/root/reference/models/base_model.py:189-212, keys from
models/inpaint_networks.py). This module ingests those files without torch:

- ``read_pth``       -> flat {key: numpy array} from either torch save format
  (the zip container of torch>=1.6, or the legacy consecutive-pickle stream)
- ``map_generator_state`` -> (params, sn) nested trees in this repo's flax
  layout: OIHW conv weights -> HWIO kernels, (out,in) linear weights ->
  (in,out) Dense kernels, ``weight_orig``/``weight_u`` spectral-norm tensors
  -> kernel + the 'sn' power-iteration vector u (v is re-derived by the
  first power iteration)
- ``load_generator_pth`` -> convenience: read + map + shape-validate against
  an existing (params, sn) pair, returning updated trees

Only data parsing happens here; nothing imports torch.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from typing import Dict, Tuple

import numpy as np

_MAGIC_LEGACY = 0x1950A86A20F9469CFC6C

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


def _bfloat16_dtype():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


class _StorageType:
    """Marker produced by find_class for torch.XxxStorage references."""

    def __init__(self, name: str):
        self.name = name

    @property
    def dtype(self):
        if self.name == "BFloat16Storage":
            return _bfloat16_dtype()
        try:
            return np.dtype(_STORAGE_DTYPES[self.name])
        except KeyError:
            raise ValueError(f"unsupported torch storage type {self.name}")


class _Storage:
    """A loaded (or to-be-loaded) flat buffer."""

    def __init__(self, dtype, data: np.ndarray = None):
        self.dtype = dtype
        self.data = data  # 1-D numpy array once materialized


def _rebuild_tensor(storage: _Storage, offset, size, stride):
    """torch._utils._rebuild_tensor_v2 semantics: an as_strided view into the
    flat storage (strides in elements)."""

    def materialize():
        flat = storage.data
        if flat is None:
            raise ValueError("storage bytes missing for tensor")
        itemsize = flat.dtype.itemsize
        base = flat[offset:]
        if not size:
            return base[:1].reshape(()).copy()
        arr = np.lib.stride_tricks.as_strided(
            base, shape=tuple(size), strides=tuple(s * itemsize for s in stride)
        )
        return np.ascontiguousarray(arr)

    return _LazyTensor(materialize)


class _LazyTensor:
    """Defers materialization until storages are read (legacy format reads
    tensor metadata before storage bytes)."""

    def __init__(self, fn):
        self._fn = fn

    def to_numpy(self) -> np.ndarray:
        return self._fn()


class _ODict(dict):
    """collections.OrderedDict stand-in. Real torch state dicts carry a
    ``_metadata`` attribute that pickle applies via BUILD (instance-dict
    state); weights don't need it, so absorb and drop it."""

    def __setstate__(self, state):
        pass


class _Unpickler(pickle.Unpickler):
    def __init__(self, f, persistent_load):
        super().__init__(f, encoding="latin1")
        self._persistent_load = persistent_load

    def persistent_load(self, pid):
        return self._persistent_load(pid)

    def find_class(self, module, name):
        if name.endswith("Storage"):
            return _StorageType(name)
        if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
            def rebuild_v2(storage, offset, size, stride, requires_grad, hooks, metadata=None):
                return _rebuild_tensor(storage, offset, size, stride)

            return rebuild_v2
        if (module, name) == ("torch._utils", "_rebuild_tensor"):
            return _rebuild_tensor
        if (module, name) == ("torch._utils", "_rebuild_parameter"):
            return lambda data, requires_grad=True, hooks=None: data
        if (module, name) == ("torch", "Size"):
            return tuple
        if (module, name) == ("collections", "OrderedDict"):
            return _ODict
        if module.startswith(("torch", "numpy", "collections", "builtins", "_codecs")):
            try:
                return super().find_class(module, name)
            except Exception:
                pass
        # unknown classes become inert shells (state dicts don't need them)
        return type(name, (), {"__setstate__": lambda self, state: None})


def _read_zip_pth(path: str) -> Dict[str, np.ndarray]:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        prefix = pkl_name[: -len("data.pkl")]
        storages: Dict[str, _Storage] = {}

        def persistent_load(pid):
            kind, storage_type, key, _location, _numel = pid[0], pid[1], pid[2], pid[3], pid[4]
            if kind != "storage":
                raise ValueError(f"unknown persistent id {pid!r}")
            if key not in storages:
                dtype = storage_type.dtype
                raw = zf.read(f"{prefix}data/{key}")
                storages[key] = _Storage(dtype, np.frombuffer(raw, dtype=dtype).copy())
            return storages[key]

        obj = _Unpickler(io.BytesIO(zf.read(pkl_name)), persistent_load).load()
    return _to_numpy_dict(obj)


def _read_legacy_pth(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        magic = pickle.load(f)
        if magic != _MAGIC_LEGACY:
            raise ValueError(f"not a legacy torch file (magic {magic})")
        pickle.load(f)  # protocol version
        pickle.load(f)  # sys info
        storages: Dict[str, _Storage] = {}

        def persistent_load(pid):
            if pid[0] == "module":
                return pid[1]
            if pid[0] != "storage":
                raise ValueError(f"unknown persistent id {pid!r}")
            storage_type, root_key = pid[1], pid[2]
            # pid[3]=location, pid[4]=numel, pid[5]=view_metadata
            view = pid[5] if len(pid) > 5 else None
            if root_key not in storages:
                storages[root_key] = _Storage(storage_type.dtype)
            if view:
                raise ValueError("storage views are not supported")
            return storages[root_key]

        obj = _Unpickler(f, persistent_load).load()
        keys = pickle.load(f)
        for key in keys:
            st = storages[key]
            (numel,) = struct.unpack("<q", f.read(8))
            raw = f.read(numel * st.dtype.itemsize)
            st.data = np.frombuffer(raw, dtype=st.dtype).copy()
    return _to_numpy_dict(obj)


def _to_numpy_dict(obj, prefix="") -> Dict[str, np.ndarray]:
    """Flatten {state_dict or nested dict} into {dotted key: numpy array}."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            if not isinstance(k, str):
                continue  # e.g. _metadata keyed oddly
            key = f"{prefix}{k}"
            if isinstance(v, (dict,)):
                out.update(_to_numpy_dict(v, prefix=f"{key}."))
            elif isinstance(v, _LazyTensor):
                out[key] = v.to_numpy()
            elif isinstance(v, np.ndarray):
                out[key] = v
        return out
    if isinstance(obj, _LazyTensor):
        return {prefix.rstrip("."): obj.to_numpy()}
    raise ValueError(f"unsupported checkpoint root object {type(obj)}")


def read_pth(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth checkpoint into {key: numpy array} without torch."""
    if zipfile.is_zipfile(path):
        return _read_zip_pth(path)
    return _read_legacy_pth(path)


# -------------------------------------------------------------- name mapping


def map_generator_state(state: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Map reference-Generator torch keys to (params, sn) nested trees.

    Key shapes (inpaint_networks.py): every gen_conv is spectral-normed, so
    conv weights appear as ``<mod>.conv.weight_orig`` (OIHW) with power-
    iteration vectors ``weight_u`` (O,) / ``weight_v`` (I*kh*kw,); the two
    fc_height heads are plain Linear ``weight`` (1, C) + ``bias``.
    """
    params: dict = {}
    sn: dict = {}

    def put(tree, dotted_path, leaf_name, value):
        node = tree
        for part in dotted_path:
            node = node.setdefault(part, {})
        node[leaf_name] = value

    for key, arr in state.items():
        parts = key.split(".")
        if parts[-1] in ("weight_v",):
            continue  # v is rebuilt by the first power iteration
        if parts[-1] == "num_batches_tracked":
            continue
        if parts[-1] == "weight_u":
            put(sn, parts[:-1], "u", np.asarray(arr, np.float32))
            continue
        if parts[-1] in ("weight_orig", "weight"):
            a = np.asarray(arr, np.float32)
            if a.ndim == 4:  # conv OIHW -> HWIO
                put(params, parts[:-1], "kernel", np.transpose(a, (2, 3, 1, 0)))
            elif a.ndim == 2:  # linear (out,in) -> (in,out)
                put(params, parts[:-1], "kernel", np.transpose(a, (1, 0)))
            else:
                put(params, parts[:-1], "kernel", a)
            continue
        if parts[-1] == "bias":
            put(params, parts[:-1], "bias", np.asarray(arr, np.float32))
            continue
        # anything else (running stats etc.) has no generator counterpart
    return params, sn


def map_discriminator_state(
    state: Dict[str, np.ndarray], n_layers: int = 3
) -> Tuple[dict, dict]:
    """Map a reference NLayerDiscriminator state dict to (params, batch_stats).

    The reference D (networks.py:555-602) is an nn.Sequential named ``model``
    with positional indices: conv0 at model.0, then for n in 1..n_layers a
    (conv, norm, LeakyReLU) triple starting at model.{2+(n-1)*3}, and the
    1-channel output conv at model.{2+n_layers*3}. This repo's
    NLayerDiscriminator names them conv0/conv{n}/norm{n}/conv_out
    (discriminator.py:28-75). PixelDiscriminator (n_layers=1 layout: model.0,
    model.2, model.3 norm, model.5) is not covered here — its reference
    variant is never built by the pix2pix path.
    """
    idx_to_name = {0: "conv0", 2 + n_layers * 3: "conv_out"}
    idx_to_norm = {}
    for n in range(1, n_layers + 1):
        base = 2 + (n - 1) * 3
        idx_to_name[base] = f"conv{n}"
        idx_to_norm[base + 1] = f"norm{n}"

    params: dict = {}
    stats: dict = {}
    for key, arr in state.items():
        parts = key.split(".")
        # NLayerDiscriminator's sequential is named 'model'; the reference
        # PixelDiscriminator names its (layout-compatible, n_layers=1)
        # sequential 'net' (networks.py:753)
        if parts[0] not in ("model", "net") or len(parts) != 3:
            continue
        idx, leaf = int(parts[1]), parts[2]
        a = np.asarray(arr, np.float32)
        if idx in idx_to_name:
            name = idx_to_name[idx]
            if leaf == "weight":  # conv OIHW -> HWIO
                params.setdefault(name, {})["kernel"] = np.transpose(a, (2, 3, 1, 0))
            elif leaf == "bias":
                params.setdefault(name, {})["bias"] = a
        elif idx in idx_to_norm:
            name = idx_to_norm[idx]
            if leaf == "weight":
                params.setdefault(name, {})["scale"] = a
            elif leaf == "bias":
                params.setdefault(name, {})["bias"] = a
            elif leaf == "running_mean":
                stats.setdefault(name, {})["mean"] = a
            elif leaf == "running_var":
                stats.setdefault(name, {})["var"] = a
            # num_batches_tracked has no flax counterpart
        else:
            raise KeyError(f"unexpected discriminator key {key}")
    return params, stats


def load_discriminator_pth(path: str, params, batch_stats, n_layers: int = 3):
    """Read a reference ``*_net_D_k.pth`` and overlay it onto an initialized
    (params, batch_stats) pair. Returns (params, batch_stats, n_loaded)."""
    state = read_pth(path)
    p_new, s_new = map_discriminator_state(state, n_layers=n_layers)
    params, n1 = _merge_validated(params, p_new)
    batch_stats, n2 = _merge_validated(batch_stats, s_new)
    return params, batch_stats, n1 + n2


def _merge_validated(dst, src, path=""):
    """Overlay src onto dst; every src leaf must exist in dst with the same
    shape. Returns (merged, loaded_leaf_count)."""
    if not isinstance(dst, dict):
        raise KeyError(f"unexpected subtree at {path}")
    merged = dict(dst)
    n = 0
    for k, v in src.items():
        p = f"{path}/{k}" if path else k
        if k not in dst:
            raise KeyError(f"checkpoint key {p} not in model")
        if isinstance(v, dict):
            merged[k], dn = _merge_validated(dst[k], v, p)
            n += dn
        else:
            have = np.shape(dst[k])
            want = np.shape(v)
            if tuple(have) != tuple(want):
                raise ValueError(f"shape mismatch at {p}: model {have} vs pth {want}")
            # dst leaves can be live device arrays: read .dtype directly —
            # np.asarray would force a full D2H copy per parameter (~0.5-1 s
            # each through the tunnel)
            merged[k] = np.asarray(v, dst[k].dtype if hasattr(dst[k], "dtype") else np.float32)
            n += 1
    return merged, n


def load_generator_pth(path: str, params, sn) -> Tuple[dict, dict, int]:
    """Read a reference .pth generator checkpoint and overlay it onto an
    initialized (params, sn) pair. Returns (params, sn, n_loaded_leaves)."""
    state = read_pth(path)
    # base_model.py saves bare state dicts; some tools nest under 'state_dict'
    # (read_pth flattens with dotted keys, so the nesting shows up as a
    # 'state_dict.' prefix on every parameter key)
    if any(k.startswith("state_dict.") for k in state):
        state = {k[len("state_dict."):]: v for k, v in state.items() if k.startswith("state_dict.")}
    p_new, sn_new = map_generator_state(state)
    params, n1 = _merge_validated(params, p_new)
    sn, n2 = _merge_validated(sn, sn_new)
    return params, sn, n1 + n2
