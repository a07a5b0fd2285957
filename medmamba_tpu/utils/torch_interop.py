"""Torch <-> flax interop: weight conversion and a reference-model loader.

Two jobs:

1. ``torch_to_flax`` / ``flax_to_torch`` convert between the reference's
   ``model_state_dict`` (torch ``.pth`` payload, train.py:310-319) and this
   framework's flax variables ({"params": ..., "batch_stats": ...}). This is
   how the reference's published per-dataset weights (README.md:28-45) are
   imported.

2. ``load_reference_vssm`` imports ``/root/reference/MedMamba.py`` on torch
   CPU with its two unavailable dependencies stubbed:
     * ``mamba_ssm.selective_scan_fn`` -> a sequential torch reference scan
       with the exact call-site semantics (MedMamba.py:273-279);
     * ``timm.layers`` -> DropPath / trunc_normal_ equivalents.
   Used by the numerical-parity test suite (tests/test_torch_parity.py) to
   prove flax logits == torch reference logits, not merely oracle-consistency.
"""
from __future__ import annotations

import os
import re
import sys
import types
from typing import Any, Dict, Sequence

import numpy as np

REFERENCE_PATH = os.environ.get("MEDMAMBA_REFERENCE",
                                "/root/reference/MedMamba.py")

# ---------------------------------------------------------------------------
# name translation: torch state_dict key -> (flax collection, path tuple,
#                                            transform tag)
# ---------------------------------------------------------------------------

_BN_IDX = {"0": "conv_bn0", "2": "conv_bn1", "5": "conv_bn2"}
_CONV_IDX = {"1": "conv3x3_0", "4": "conv3x3_1", "7": "conv1x1"}
_LN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_PARAM = {"weight": ("params", "scale"), "bias": ("params", "bias"),
             "running_mean": ("batch_stats", "mean"),
             "running_var": ("batch_stats", "var")}


def _translate(key: str):
    """Return (collection, path, transform) for a reference state_dict key,
    or None for keys without a flax counterpart (num_batches_tracked)."""
    parts = key.split(".")

    if key.startswith("patch_embed.proj."):
        return "params", ("patch_embed", "proj",
                          "kernel" if parts[-1] == "weight" else "bias"), \
            ("conv_oihw" if parts[-1] == "weight" else "none")
    if key.startswith("patch_embed.norm."):
        return "params", ("patch_embed", "norm", _LN_PARAM[parts[-1]]), "none"
    if key.startswith("head."):
        return "params", ("head", "kernel" if parts[-1] == "weight" else "bias"), \
            ("linear" if parts[-1] == "weight" else "none")

    m = re.match(r"layers\.(\d+)\.downsample\.(norm|reduction)\.(\w+)$", key)
    if m:
        i, mod, p = m.groups()
        base = (f"layers_{i}", "downsample")
        if mod == "norm":
            return "params", base + ("norm", _LN_PARAM[p]), "none"
        return "params", base + ("reduction", "kernel"), "linear"

    m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.(.+)$", key)
    if m is None:
        if key.endswith("num_batches_tracked"):
            return None
        raise KeyError(f"unrecognized reference parameter: {key}")
    i, j, rest = m.groups()
    base = (f"layers_{i}", f"blocks_{j}")
    rp = rest.split(".")

    if rp[0] == "ln_1":
        return "params", base + ("ln_1", _LN_PARAM[rp[1]]), "none"
    if rp[0] == "self_attention":
        sa = base + ("self_attention",)
        name = rp[1]
        if name in ("x_proj_weight", "dt_projs_weight", "dt_projs_bias",
                    "A_logs", "Ds"):
            return "params", sa + (name,), "none"
        if name in ("in_proj", "out_proj"):
            return "params", sa + (name, "kernel" if rp[2] == "weight"
                                   else "bias"), \
                ("linear" if rp[2] == "weight" else "none")
        if name == "conv2d":
            return "params", sa + ("conv2d",
                                   "kernel" if rp[2] == "weight" else "bias"), \
                ("conv_oihw" if rp[2] == "weight" else "none")
        if name == "out_norm":
            return "params", sa + ("out_norm", _LN_PARAM[rp[2]]), "none"
        raise KeyError(f"unrecognized SS2D parameter: {key}")
    if rp[0] == "conv33conv33conv11":
        idx, p = rp[1], rp[2]
        if p == "num_batches_tracked":
            return None
        if idx in _BN_IDX:
            coll, leaf = _BN_PARAM[p]
            return coll, base + (_BN_IDX[idx], leaf), "none"
        if idx in _CONV_IDX:
            return "params", base + (_CONV_IDX[idx],
                                     "kernel" if p == "weight" else "bias"), \
                ("conv_oihw" if p == "weight" else "none")
    raise KeyError(f"unrecognized reference parameter: {key}")


def _fwd_transform(arr: np.ndarray, tag: str) -> np.ndarray:
    if tag == "linear":           # torch (out, in) -> flax (in, out)
        return arr.T
    if tag == "conv_oihw":        # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
        return arr.transpose(2, 3, 1, 0)
    return arr


def _bwd_transform(arr: np.ndarray, tag: str) -> np.ndarray:
    if tag == "linear":
        return arr.T
    if tag == "conv_oihw":
        return arr.transpose(3, 2, 0, 1)
    return arr


def torch_to_flax(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference ``model_state_dict`` -> {"params": ..., "batch_stats": ...}.

    Accepts torch tensors or numpy arrays as values.
    """
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for key, val in state_dict.items():
        tr = _translate(key)
        if tr is None:
            continue
        coll, path, tag = tr
        arr = val.detach().cpu().numpy() if hasattr(val, "detach") \
            else np.asarray(val)
        node = out[coll]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = _fwd_transform(arr.astype(np.float32), tag)
    return out


def flax_to_torch(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of torch_to_flax (numpy values, reference key names)."""
    import jax

    result: Dict[str, np.ndarray] = {}
    wanted = {}
    for coll in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(variables.get(coll, {}))[0]
        for path, leaf in flat:
            keys = tuple(getattr(p, "key", str(p)) for p in path)
            wanted[(coll, keys)] = np.asarray(leaf)

    # build the torch-side key list by probing _translate over known shapes
    for (coll, keys), arr in wanted.items():
        result[_untranslate(coll, keys)] = _bwd_transform(
            arr, _tag_for(coll, keys))
    return result


def _tag_for(coll: str, keys: Sequence[str]) -> str:
    leaf, parent = keys[-1], keys[-2] if len(keys) > 1 else ""
    if leaf != "kernel":
        return "none"
    if parent in ("proj", "conv2d") or parent.startswith("conv3x3") \
            or parent == "conv1x1":
        return "conv_oihw"
    return "linear"


def _untranslate(coll: str, keys: Sequence[str]) -> str:
    """flax path -> reference state_dict key."""
    parts = []
    conv_rev = {v: k for k, v in _CONV_IDX.items()}
    bn_rev = {v: k for k, v in _BN_IDX.items()}
    i = 0
    while i < len(keys):
        k = keys[i]
        m = re.match(r"(layers|blocks)_(\d+)$", k)
        if m:
            parts += [m.group(1), m.group(2)]
        elif k in conv_rev:
            parts += ["conv33conv33conv11", conv_rev[k]]
        elif k in bn_rev:
            parts += ["conv33conv33conv11", bn_rev[k]]
        elif k == "kernel":
            parts.append("weight")
        elif k == "scale":
            parts.append("weight")
        elif k == "mean":
            parts.append("running_mean")
        elif k == "var":
            parts.append("running_var")
        else:
            parts.append(k)
        i += 1
    return ".".join(parts)


# ---------------------------------------------------------------------------
# reference-model loader (torch CPU, stubbed deps)
# ---------------------------------------------------------------------------

def _install_stubs():
    import torch
    import torch.nn.functional as tF

    if "timm" not in sys.modules or not hasattr(
            sys.modules.get("timm.layers", None), "DropPath"):
        timm = types.ModuleType("timm")
        layers = types.ModuleType("timm.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=0.0, scale_by_keep=True):
                super().__init__()
                self.drop_prob = float(drop_prob or 0.0)
                self.scale_by_keep = scale_by_keep

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = x.new_empty(shape).bernoulli_(keep)
                return x * mask / keep if self.scale_by_keep else x * mask

        layers.DropPath = DropPath
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = layers

    if "mamba_ssm.ops.selective_scan_interface" not in sys.modules:
        def selective_scan_fn(u, delta, A, B, C, D=None, z=None,
                              delta_bias=None, delta_softplus=False,
                              return_last_state=False):
            """Sequential torch reference of the CUDA kernel's semantics
            (the ``selective_scan_ref`` analogue, cf. temp.py:13)."""
            u = u.float()
            delta = delta.float()
            if delta_bias is not None:
                delta = delta + delta_bias[..., None].float()
            if delta_softplus:
                delta = tF.softplus(delta)
            b, d, l = u.shape
            n = A.shape[1]
            g = B.shape[1]
            Bx = B.float().repeat_interleave(d // g, dim=1)   # (b, d, n, l)
            Cx = C.float().repeat_interleave(d // g, dim=1)
            dA = torch.exp(delta.unsqueeze(-1) * A.float()[:, None, :])  # (b,d,l,n)
            dBu = (delta * u).unsqueeze(-1) * Bx.permute(0, 1, 3, 2)
            h = u.new_zeros(b, d, n)
            ys = []
            for t in range(l):
                h = dA[:, :, t] * h + dBu[:, :, t]
                ys.append((h * Cx[:, :, :, t]).sum(-1))
            y = torch.stack(ys, dim=2)                        # (b, d, l)
            if D is not None:
                y = y + u * D.float()[:, None]
            if z is not None:
                y = y * tF.silu(z)
            if return_last_state:
                return y, h
            return y

        mamba = types.ModuleType("mamba_ssm")
        ops = types.ModuleType("mamba_ssm.ops")
        iface = types.ModuleType("mamba_ssm.ops.selective_scan_interface")
        iface.selective_scan_fn = selective_scan_fn
        ops.selective_scan_interface = iface
        mamba.ops = ops
        sys.modules["mamba_ssm"] = mamba
        sys.modules["mamba_ssm.ops"] = ops
        sys.modules["mamba_ssm.ops.selective_scan_interface"] = iface


_REF_MODULE = None


def load_reference_module():
    """Import /root/reference/MedMamba.py (read-only) with stubbed deps."""
    global _REF_MODULE
    if _REF_MODULE is None:
        import importlib.util

        _install_stubs()
        spec = importlib.util.spec_from_file_location(
            "medmamba_reference", REFERENCE_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _REF_MODULE = mod
    return _REF_MODULE


def load_reference_vssm(**kwargs):
    """Instantiate the reference VSSM on torch CPU (eval mode)."""
    mod = load_reference_module()
    model = mod.VSSM(**kwargs)
    model.eval()
    return model
