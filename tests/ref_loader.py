"""Load reference (/root/reference) torch modules as test oracles.

The reference package is imported standalone (no package __init__, which
drags in the registry/training stack), with torchvision stubbed (not in this
image; only imported at module top level, never used on the paths the
oracles drive) and `.cuda()` neutralized for CPU-only torch.
"""

import os
import sys
import types

REF = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF, "models"))


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.utils = types.ModuleType("torchvision.utils")
    tv.utils.save_image = lambda *a, **k: None
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.utils"] = tv.utils


def load_reference_models(*names):
    """Import reference `models/<name>.py` files under a synthetic package
    `_refmodels` (so their relative imports resolve) and return them in order.
    Dependencies must be listed before their dependents."""
    import importlib.util

    _stub_torchvision()
    pkg = sys.modules.get("_refmodels")
    if pkg is None:
        pkg = types.ModuleType("_refmodels")
        pkg.__path__ = [os.path.join(REF, "models")]
        sys.modules["_refmodels"] = pkg
    out = []
    for name in names:
        full = f"_refmodels.{name}"
        if full not in sys.modules:
            spec = importlib.util.spec_from_file_location(
                full, os.path.join(REF, "models", f"{name}.py")
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[full] = mod
            spec.loader.exec_module(mod)
            setattr(pkg, name, mod)
        out.append(sys.modules[full])
    return out[0] if len(out) == 1 else out


def neutralize_cuda(torch):
    """Make `.cuda()` a no-op (the reference hard-codes it, pix2pix_model.py:105)."""
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self


def converge_spectral_norm(torch, model, iters=200):
    """Run torch's own power iteration to convergence on every SN'd conv.

    torch's eval-mode spectral norm uses the *stored* (u, v) pair; our SNConv
    stores only u and recomputes v = normalize(W^T u). The two sigmas agree
    exactly when u has converged to the leading singular vector.
    """
    import torch.nn.functional as F

    with torch.no_grad():
        for mod in model.modules():
            if hasattr(mod, "weight_orig"):
                w = mod.weight_orig.detach().reshape(mod.weight_orig.shape[0], -1)
                u = mod.weight_u.detach()
                for _ in range(iters):
                    v = F.normalize(torch.mv(w.t(), u), dim=0, eps=1e-12)
                    u = F.normalize(torch.mv(w, v), dim=0, eps=1e-12)
                mod.weight_u.copy_(u)
                mod.weight_v.copy_(v)
