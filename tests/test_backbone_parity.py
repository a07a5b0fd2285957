"""Numerical parity of the ViT CAM backbone against the reference torch
implementation (grad_cam/vit_model.py), loaded directly from /root/reference.

Round 1's backbone tests were shape/finite-only (VERDICT weak #8); this pins
the flax ViT to the actual reference numerics via a weight converter.
"""
import importlib.util

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from medmamba_tpu.models.vit import VisionTransformer  # noqa: E402

_REF_VIT = "/root/reference/grad_cam/vit_model.py"


def _load_ref_vit():
    spec = importlib.util.spec_from_file_location("ref_vit", _REF_VIT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _vit_torch_to_flax(sd, depth):
    """Reference ViT state_dict -> flax params (linear weights transposed,
    patch conv OIHW -> HWIO)."""
    p = {
        "cls_token": sd["cls_token"].numpy(),
        "pos_embed": sd["pos_embed"].numpy(),
        "patch_embed": {"proj": {
            "kernel": sd["patch_embed.proj.weight"].numpy().transpose(2, 3, 1, 0),
            "bias": sd["patch_embed.proj.bias"].numpy()}},
        "norm": {"scale": sd["norm.weight"].numpy(),
                 "bias": sd["norm.bias"].numpy()},
        "head": {"kernel": sd["head.weight"].numpy().T,
                 "bias": sd["head.bias"].numpy()},
    }
    for i in range(depth):
        b = f"blocks.{i}."
        p[f"blocks_{i}"] = {
            "norm1": {"scale": sd[b + "norm1.weight"].numpy(),
                      "bias": sd[b + "norm1.bias"].numpy()},
            "norm2": {"scale": sd[b + "norm2.weight"].numpy(),
                      "bias": sd[b + "norm2.bias"].numpy()},
            "attn": {
                "qkv": {"kernel": sd[b + "attn.qkv.weight"].numpy().T,
                        "bias": sd[b + "attn.qkv.bias"].numpy()},
                "proj": {"kernel": sd[b + "attn.proj.weight"].numpy().T,
                         "bias": sd[b + "attn.proj.bias"].numpy()},
            },
            "mlp": {
                "fc1": {"kernel": sd[b + "mlp.fc1.weight"].numpy().T,
                        "bias": sd[b + "mlp.fc1.bias"].numpy()},
                "fc2": {"kernel": sd[b + "mlp.fc2.weight"].numpy().T,
                        "bias": sd[b + "mlp.fc2.bias"].numpy()},
            },
        }
    return {"params": p}


_REF_MNV2 = "/root/reference/ConfusionMatrix/model.py"
_MNV2_CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def _conv_t(w):
    return w.numpy().transpose(2, 3, 1, 0)


def _bn(sd, prefix):
    return ({"scale": sd[prefix + ".weight"].numpy(),
             "bias": sd[prefix + ".bias"].numpy()},
            {"mean": sd[prefix + ".running_mean"].numpy(),
             "var": sd[prefix + ".running_var"].numpy()})


def _mnv2_torch_to_flax(sd):
    params, stats = {}, {}

    def cbr(dst, conv_key, bn_key):
        bnp, bns = _bn(sd, bn_key)
        params[dst] = {"conv": {"kernel": _conv_t(sd[conv_key + ".weight"])},
                       "bn": bnp}
        stats[dst] = {"bn": bns}

    cbr("stem", "features.0.0", "features.0.1")
    i = 0
    for t, _c, n, _s in _MNV2_CFG:
        for _ in range(n):
            tp = f"features.{i + 1}.conv"
            blk_p, blk_s = {}, {}
            off = 0
            if t != 1:
                bnp, bns = _bn(sd, f"{tp}.0.1")
                blk_p["expand"] = {"conv": {"kernel":
                                            _conv_t(sd[f"{tp}.0.0.weight"])},
                                   "bn": bnp}
                blk_s["expand"] = {"bn": bns}
                off = 1
            bnp, bns = _bn(sd, f"{tp}.{off}.1")
            blk_p["dw"] = {"conv": {"kernel": _conv_t(sd[f"{tp}.{off}.0.weight"])},
                           "bn": bnp}
            blk_s["dw"] = {"bn": bns}
            blk_p["project"] = {"kernel": _conv_t(sd[f"{tp}.{off + 1}.weight"])}
            bnp, bns = _bn(sd, f"{tp}.{off + 2}")
            blk_p["project_bn"] = bnp
            blk_s["project_bn"] = bns
            params[f"block_{i}"] = blk_p
            stats[f"block_{i}"] = blk_s
            i += 1
    cbr("head_conv", "features.18.0", "features.18.1")
    params["classifier"] = {"kernel": sd["classifier.1.weight"].numpy().T,
                            "bias": sd["classifier.1.bias"].numpy()}
    return {"params": params, "batch_stats": stats}


def test_mobilenet_v2_logits_match_reference():
    import importlib.util

    from medmamba_tpu.models.mobilenet import MobileNetV2

    spec = importlib.util.spec_from_file_location("ref_mnv2", _REF_MNV2)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(1)
    ref = mod.MobileNetV2(num_classes=5)
    # randomize BN running stats so eval-mode normalization is non-trivial
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    model = MobileNetV2(num_classes=5)
    variables = _mnv2_torch_to_flax(ref.state_dict())

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    logits = np.asarray(model.apply(variables, jnp.asarray(x), False))
    np.testing.assert_allclose(logits, ref_logits, rtol=1e-4, atol=1e-4)


_REF_SWIN = "/root/reference/grad_cam/swin_model.py"


def _swin_torch_to_flax(sd, depths):
    p = {
        "patch_embed": {"kernel": _conv_t(sd["patch_embed.proj.weight"]),
                        "bias": sd["patch_embed.proj.bias"].numpy()},
        "patch_norm": {"scale": sd["patch_embed.norm.weight"].numpy(),
                       "bias": sd["patch_embed.norm.bias"].numpy()},
        "norm": {"scale": sd["norm.weight"].numpy(),
                 "bias": sd["norm.bias"].numpy()},
        "head": {"kernel": sd["head.weight"].numpy().T,
                 "bias": sd["head.bias"].numpy()},
    }
    for i, depth in enumerate(depths):
        for j in range(depth):
            b = f"layers.{i}.blocks.{j}."
            p[f"layers_{i}_blocks_{j}"] = {
                "norm1": {"scale": sd[b + "norm1.weight"].numpy(),
                          "bias": sd[b + "norm1.bias"].numpy()},
                "norm2": {"scale": sd[b + "norm2.weight"].numpy(),
                          "bias": sd[b + "norm2.bias"].numpy()},
                "attn": {
                    "relative_position_bias_table":
                        sd[b + "attn.relative_position_bias_table"].numpy(),
                    "qkv": {"kernel": sd[b + "attn.qkv.weight"].numpy().T,
                            "bias": sd[b + "attn.qkv.bias"].numpy()},
                    "proj": {"kernel": sd[b + "attn.proj.weight"].numpy().T,
                             "bias": sd[b + "attn.proj.bias"].numpy()},
                },
                "mlp": {
                    "fc1": {"kernel": sd[b + "mlp.fc1.weight"].numpy().T,
                            "bias": sd[b + "mlp.fc1.bias"].numpy()},
                    "fc2": {"kernel": sd[b + "mlp.fc2.weight"].numpy().T,
                            "bias": sd[b + "mlp.fc2.bias"].numpy()},
                },
            }
        dkey = f"layers.{i}.downsample."
        if dkey + "reduction.weight" in sd:
            p[f"layers_{i}_downsample"] = {
                "reduction": {"kernel": sd[dkey + "reduction.weight"].numpy().T},
                "norm": {"scale": sd[dkey + "norm.weight"].numpy(),
                         "bias": sd[dkey + "norm.bias"].numpy()},
            }
    return {"params": p}


def test_swin_logits_match_reference():
    import importlib.util

    from medmamba_tpu.models.swin import SwinTransformer

    spec = importlib.util.spec_from_file_location("ref_swin", _REF_SWIN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(2)
    depths, heads = (2, 2), (2, 4)
    ref = mod.SwinTransformer(patch_size=4, embed_dim=16, depths=depths,
                              num_heads=heads, window_size=4, num_classes=5,
                              drop_path_rate=0.0)
    ref.eval()

    model = SwinTransformer(patch_size=4, embed_dim=16, depths=depths,
                            num_heads=heads, window_size=4, num_classes=5,
                            drop_path_rate=0.0)
    variables = _swin_torch_to_flax(ref.state_dict(), depths)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    logits = np.asarray(model.apply(variables, jnp.asarray(x), True))
    np.testing.assert_allclose(logits, ref_logits, rtol=1e-4, atol=1e-4)


def test_vit_logits_match_reference():
    ref_mod = _load_ref_vit()
    torch.manual_seed(0)
    depth, dim, heads, patch, img = 2, 64, 4, 8, 32
    ref = ref_mod.VisionTransformer(
        img_size=img, patch_size=patch, embed_dim=dim, depth=depth,
        num_heads=heads, num_classes=5, qkv_bias=True)
    ref.eval()
    # non-trivial weights (reference init leaves some params at zeros)
    sd = ref.state_dict()
    for k, v in sd.items():
        if "pos_embed" in k or "cls_token" in k:
            sd[k] = 0.02 * torch.randn_like(v)
    ref.load_state_dict(sd)

    model = VisionTransformer(patch_size=patch, embed_dim=dim, depth=depth,
                              num_heads=heads, num_classes=5)
    variables = _vit_torch_to_flax(ref.state_dict(), depth)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, img, img, 3)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    logits = np.asarray(model.apply(variables, jnp.asarray(x), True))
    np.testing.assert_allclose(logits, ref_logits, rtol=1e-4, atol=1e-4)
