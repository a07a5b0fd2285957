"""Numerical parity against the ACTUAL torch reference implementation.

Round 1 tested against a self-written numpy oracle, which proves
self-consistency only. Here the reference ``/root/reference/MedMamba.py`` runs
on torch CPU (mamba_ssm stubbed with sequential reference-scan semantics,
timm stubbed with equivalent DropPath/trunc_normal_), its state_dict is
converted with the production ``.pth`` converter, and fp32 logits must agree.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from medmamba_tpu.models.vssm import VSSM  # noqa: E402
from medmamba_tpu.utils.torch_interop import (  # noqa: E402
    flax_to_torch, load_reference_vssm, torch_to_flax)


def _make_pair(depths=(2, 2, 4, 2), dims=(96, 192, 384, 768), num_classes=9,
               seed=0):
    torch.manual_seed(seed)
    ref = load_reference_vssm(depths=list(depths), dims=list(dims),
                              num_classes=num_classes)
    variables = torch_to_flax(ref.state_dict())
    model = VSSM(num_classes=num_classes, depths=depths, dims=dims,
                 scan_impl="seq")
    return ref, model, variables


def test_logit_parity_full_T_model():
    """End-to-end fp32 logit agreement on the full medmamba_t architecture."""
    ref, model, variables = _make_pair()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    logits = np.asarray(model.apply(variables, jnp.asarray(x), True))

    assert ref_logits.shape == logits.shape == (2, 9)
    np.testing.assert_allclose(logits, ref_logits, rtol=1e-4, atol=1e-4)


def test_backbone_feature_parity_small():
    """Per-stage feature-map agreement on a small config (tighter diagnosis)."""
    ref, model, variables = _make_pair(depths=(1, 1), dims=(32, 64),
                                       num_classes=3, seed=1)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        ref_feat = ref.forward_backbone(
            torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    feat = np.asarray(model.apply(variables, jnp.asarray(x), True,
                                  method=VSSM.forward_backbone))
    np.testing.assert_allclose(feat, ref_feat, rtol=1e-4, atol=1e-4)


def test_converter_roundtrip():
    """torch -> flax -> torch reproduces every tensor bit-exactly."""
    ref, _, variables = _make_pair(depths=(1, 1), dims=(16, 32),
                                   num_classes=2, seed=2)
    back = flax_to_torch(variables)
    sd = ref.state_dict()
    missing = [k for k in sd if k not in back
               and not k.endswith("num_batches_tracked")]
    assert not missing, f"converter dropped keys: {missing[:5]}"
    extra = [k for k in back if k not in sd]
    assert not extra, f"converter invented keys: {extra[:5]}"
    for k, v in back.items():
        np.testing.assert_array_equal(v, sd[k].numpy(), err_msg=k)


def test_loading_converted_weights_into_torch():
    """The reverse converter produces a loadable reference state_dict (the
    round-trip a user needs to export finetuned weights back to torch)."""
    ref, _, variables = _make_pair(depths=(1, 1), dims=(16, 32),
                                   num_classes=2, seed=3)
    back = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in flax_to_torch(variables).items()}
    missing, unexpected = ref.load_state_dict(back, strict=False)
    assert not unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing)
