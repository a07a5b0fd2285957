"""MedMamba VSSM, TPU-native (flax.linen, NHWC, bf16-friendly).

Re-implements the capability of the reference model (``/root/reference/MedMamba.py``)
with a TPU-first design:

* NHWC layout end to end (XLA-TPU's preferred conv layout); the reference permutes
  between NCHW and BHWC repeatedly (``MedMamba.py:294, 299, 352, 354, 511``).
* The four-direction selective scan runs through ``medmamba_tpu.ops`` — a fused
  Pallas kernel on TPU, pure-XLA associative scan elsewhere — replacing the CUDA
  ``selective_scan_fn`` (``MedMamba.py:273-279``).
* Block compute can run in bfloat16 (``dtype``); the scan core is forced to float32
  exactly like the reference (``MedMamba.py:265-271``).
* ``use_checkpoint`` maps to ``flax.linen.remat`` (reference: torch.utils.checkpoint
  per block, ``MedMamba.py:413-415``).

Parameterization matches the reference exactly (same tensors, same shapes, same
init distributions) so parameter counts reproduce T 14.46M / S 18.63M / B 39.87M /
Te 13.70M at 9 classes (SURVEY §2.1).
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from medmamba_tpu.ops.cross_scan import (cross_scan, cross_merge,
                                          cross_scan_fwd, cross_merge_fr)
from medmamba_tpu.ops.selective_scan import selective_scan

Dtype = Any

# Candidate Pallas-kernel segment lengths for host-side selection (largest
# safe one wins; 16 is the always-safe floor). Kept here so the sow in SS2D
# and the selector in train/tau_select.py agree on the order.
SCAN_TAU_CANDIDATES = (32, 64, 128)

# ---------------------------------------------------------------------------
# Initializers (parity with MedMamba.py:193-247 and :470-489)
# ---------------------------------------------------------------------------

trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02)
kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def dt_weight_init(dt_rank: int):
    """Uniform(+/- dt_rank^-0.5), cf. SS2D.dt_init (MedMamba.py:198-202)."""
    std = dt_rank ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-std, maxval=std)

    return init


def dt_bias_init(dt_min: float = 1e-3, dt_max: float = 0.1, floor: float = 1e-4):
    """Inverse-softplus of log-uniform dt sample (MedMamba.py:206-214)."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.maximum(dt, floor)
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


def x_proj_init(d_inner: int):
    """torch nn.Linear default init: kaiming-uniform(a=sqrt(5)) == U(+/- fan_in^-0.5).

    In the reference the stacked x_proj parameter is a raw nn.Parameter built
    from nn.Linear weights (MedMamba.py:164-171) and therefore escapes
    VSSM._init_weights -- it keeps the torch Linear default, not trunc-normal.
    """
    bound = d_inner ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def a_log_init(key, shape, dtype=jnp.float32):
    """S4D-real init: log(1..N) tiled over channels (MedMamba.py:220-235).

    shape = (K*d_inner, d_state)."""
    n = shape[-1]
    row = jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32))
    return jnp.broadcast_to(row, shape).astype(dtype)


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics, used MedMamba.py:335)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class MaskedBatchNorm(nn.Module):
    """BatchNorm (feature axis -1) with an optional per-sample validity mask.

    Parameter / batch_stats structure and semantics match
    ``flax.linen.BatchNorm(momentum, epsilon)`` exactly when ``mask is None``.
    With a mask, batch statistics are computed only over mask-valid batch
    elements: the reference never pads batches (its torch DataLoader just
    yields a smaller final batch, train.py:166-170), while this framework pads
    the final partial batch to keep one static XLA shape -- padded duplicate
    rows must not bias the running statistics.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            if mask is None:
                mean = jnp.mean(xf, axis=red)
                var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
            else:
                w = mask.astype(jnp.float32).reshape(
                    (x.shape[0],) + (1,) * (x.ndim - 1))
                per_sample = float(np.prod(x.shape[1:-1]))
                cnt = jnp.maximum(jnp.sum(w) * per_sample, 1.0)
                mean = jnp.sum(xf * w, axis=red) / cnt
                var = jnp.sum(jnp.square(xf) * w, axis=red) / cnt \
                    - jnp.square(mean)
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(self.dtype) - mean.astype(self.dtype)) \
            * inv.astype(self.dtype) + bias.astype(self.dtype)
        return y


class PatchEmbed2D(nn.Module):
    """4x4 non-overlapping conv patchify + optional LayerNorm (MedMamba.py:54-76)."""

    patch_size: int = 4
    embed_dim: int = 96
    patch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C_in)
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            kernel_init=kaiming_fan_out, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="proj",
        )(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class PatchMerging2D(nn.Module):
    """Swin-style 2x downsample: 2x2 gather -> LN(4C) -> Dense(2C, no bias).

    Gather order (even/even, odd/even, even/odd, odd/odd) matches
    MedMamba.py:102-105; odd-size crop fix matches :96-111.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        hh, ww = h // 2, w // 2
        x0 = x[:, 0::2, 0::2, :][:, :hh, :ww]
        x1 = x[:, 1::2, 0::2, :][:, :hh, :ww]
        x2 = x[:, 0::2, 1::2, :][:, :hh, :ww]
        x3 = x[:, 1::2, 1::2, :][:, :hh, :ww]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * c, use_bias=False, kernel_init=trunc_normal_02,
                     dtype=self.dtype, name="reduction")(x)
        return x


class SS2D(nn.Module):
    """2D selective scan module (VMamba SS2D), cf. MedMamba.py:123-305.

    Dataflow: in_proj -> (x, z) -> depthwise 3x3 conv + SiLU -> CrossScan ->
    per-direction dt/B/C projections -> S6 selective scan (fp32) -> CrossMerge ->
    LayerNorm -> gate with silu(z) -> out_proj.
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: int = 2
    dt_rank: Optional[int] = None
    dropout: float = 0.0
    conv_bias: bool = True
    bias: bool = False
    dtype: Dtype = jnp.float32
    scan_impl: str = "auto"
    # Pallas-kernel segment length (static; changing it retraces). None = the
    # MEDMAMBA_SCAN_TAU env default (16). Larger tau is faster but exact only
    # while |A * seg_sum(dt)| <= 2*CLIP per segment; the training CLI picks it
    # per stage from measured magnitudes (train/tau_select.py).
    scan_tau: Any = None  # int | ('nsplit', perm, m, tau_hi, tau_lo)

    def _sow_seg_budgets(self, dts, bias2, A2, valid_len=None):
        """Sow max |A| * seg_sum(dt) per candidate tau into ``scan_stats``.

        The Pallas kernel's clipped-exponent factorization is exact while
        |A[d,n] * seg_sum(dt[d])| <= 2*CLIP for every tau-aligned segment
        (pallas_scan.py ``_tau`` docstring); this is the measurement the
        host-side selector gates on. Segments are tau-aligned windows from
        position 0 -- exactly the kernel's layout for both the padded and the
        short-L packed path (padding contributes dt = 0). Costs a few cheap
        reductions and only runs when the ``scan_stats`` collection is
        mutable (calibration passes), never in the training step.
        """
        if dts.shape[-1] == 0:
            # degenerate stage (spatial extent exhausted, e.g. tiny test
            # configs): nothing to measure; the selector's floor applies
            return
        dt = jax.nn.softplus(dts.astype(jnp.float32)
                             + bias2.astype(jnp.float32)[None, :, :, None])
        if valid_len is not None and valid_len < dt.shape[-1]:
            # pre-padded sequences: the kernel zeroes dt past valid_len, so
            # the budget measurement must too (softplus(0+bias) > 0 there)
            pos = jnp.arange(dt.shape[-1])
            dt = jnp.where(pos[None, None, None, :] < valid_len, dt, 0.0)
        abs_a = jnp.abs(A2)                              # (2, d_inner, N)
        b, k2, dd, l = dt.shape
        budgets = []
        for tau_c in SCAN_TAU_CANDIDATES:
            lp = -(-l // tau_c) * tau_c
            seg = jnp.pad(dt, ((0, 0),) * 3 + ((0, lp - l),))
            seg = seg.reshape(b, k2, dd, lp // tau_c, tau_c).sum(-1)
            # per-state-dim budgets: the bound is per (d, n) lane, so keeping
            # the N axis lets the selector run low-|A| state dims at a larger
            # tau than the worst lane allows (the "nsplit" mixed-tau path)
            seg_d = jnp.max(seg, axis=(0, 3))            # (2, d_inner)
            full = seg_d[:, :, None] * abs_a             # (2, d_inner, N)
            budgets.append(jnp.max(full, axis=(0, 1)))
            if os.environ.get("MEDMAMBA_SOW_DN_BUDGETS") == "1":
                # diagnostic: keep the per-(d, n) matrix (max over direction
                # pairs) so tools/probe_dn_budgets.py can assess whether a
                # channel-level mixed-tau split has headroom beyond the
                # per-state-dim one. Never sown in production calibration.
                self.sow("scan_stats", "seg_budget_dn", jnp.max(full, axis=0))
        self.sow("scan_stats", "seg_budget", jnp.stack(budgets))  # (|cand|, N)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # (B, H, W, d_model)
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        n = self.d_state
        b, h, w, _ = x.shape
        l = h * w
        k = 4

        xz = nn.Dense(d_inner * 2, use_bias=self.bias, kernel_init=trunc_normal_02,
                      dtype=self.dtype, name="in_proj")(x)
        x, z = jnp.split(xz, 2, axis=-1)

        x = nn.Conv(
            d_inner, (self.d_conv, self.d_conv),
            padding=[( (self.d_conv - 1) // 2,) * 2] * 2,
            feature_group_count=d_inner, use_bias=self.conv_bias,
            kernel_init=kaiming_fan_out, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv2d",
        )(x)
        x = nn.silu(x)

        # --- forward_corev0 (MedMamba.py:249-286) ---
        # Directions 2/3 are exact reversals of 0/1: their scan-input data is
        # bit-identical (cross_scan_fwd), so the hot path makes TWO
        # direction-homogeneous scan calls -- one forward, one native-reverse
        # -- on the same (B, 2, D, L) tensor. No flipped copies, no
        # 4-direction stack.
        #
        # MEASURED round 3 and REJECTED: one 4-direction launch (the kernel's
        # per-group reverse branches + u_tile=2 shared-u index maps, both
        # kept and tested in ops/pallas_scan.py). Step 267.5 -> 276.9 ms on
        # v5e: the merged fwd kernel is ~+1.1 ms/block (direction-branch
        # overhead eats the launch saving), grad neutral, and the XLA glue
        # around it costs ~+8 ms/step (tiled-du reduce_sum +2.2, reshape
        # +2.6, add_any +1.9, concat/pad +1.5) against -4 ms of launch-gap
        # ("while" self-time) savings.
        #
        # Chunk-pad the sequence ONCE here (L 3136->3200 etc.): the einsums
        # run over the zero pad (dts/Bs/Cs come out pre-padded) and the scan
        # takes valid_len, replacing per-call u/dt/B/C pads in the wrapper
        # and per-call y slices (cross_merge_fr slices once). Short-L stages
        # (L <= 128) keep the batch-packed path untouched.
        lpad = -(-l // 128) * 128 if l > 128 else l
        vlen = l if lpad > l else None
        xs = cross_scan_fwd(x, pad_to=lpad)  # (B, 2, D, Lp)

        x_proj_weight = self.param(
            "x_proj_weight", x_proj_init(d_inner), (k, dt_rank + 2 * n, d_inner))
        dt_projs_weight = self.param(
            "dt_projs_weight", dt_weight_init(dt_rank), (k, d_inner, dt_rank))
        dt_projs_bias = self.param("dt_projs_bias", dt_bias_init(), (k, d_inner))
        A_logs = self.param("A_logs", a_log_init, (k * d_inner, n))
        Ds = self.param("Ds", nn.initializers.ones, (k * d_inner,))

        u = xs.reshape(b, 2 * d_inner, lpad)
        As = -jnp.exp(A_logs.astype(jnp.float32)).reshape(k, d_inner, n)
        Ds_f = Ds.astype(jnp.float32).reshape(k, d_inner)
        bias_f = dt_projs_bias.astype(jnp.float32)

        # Mixed-tau n-split ("nsplit" spec from train.tau_select): the scan's
        # exactness bound is per (d, n) lane and y = sum_n C_n * h_n, so state
        # dims whose |A[:, n]| * seg_sum(dt) fits a larger tau's budget run
        # their within-chunk machinery at that larger tau. The binding lanes
        # are the high-|A| decay dims (|A[:, n]| ~ n at the S4D init), so most
        # lanes typically admit tau=chunk while the worst few would hold the
        # whole scan at tau=64 without this. Default realization: ONE kernel
        # launch with lanes permuted tau_hi-part-first and a (m, tau_hi,
        # tau_lo) tau spec -- the kernel runs the two parts inside the same
        # program, sharing the u/dt/y (and bwd gy/du/ddt) streams the
        # round-3 two-launch realization duplicated (~18 ms/step, DESIGN.md).
        # MEDMAMBA_NSPLIT_FUSED=0 restores the two-launch split for A/B
        # measurement.
        tau_spec = self.scan_tau
        if tau_spec is None and os.environ.get("MEDMAMBA_SCAN_TAU"):
            # kernel-level forced tau (cli --scan_tau N sets both); resolve
            # here so the packing clamp below applies uniformly
            tau_spec = int(os.environ["MEDMAMBA_SCAN_TAU"])
        if isinstance(tau_spec, int):
            # Forced taus respect the short-L batch-packing cap (round 5,
            # VERDICT r4 #4): tau=128 at the 7x7 stage would run one
            # 49-lane element per 128-lane pitch -- 2.6x the HBM of the
            # packed 64 pitch (it OOM'd forced-128 at batch 256) and
            # measured SLOWER than packed-64 (ROUND4_NOTES session 3).
            from medmamba_tpu.ops.pallas_scan import packing_cap
            tau_spec = min(tau_spec, packing_cap(l))
        scan_perm = None
        if isinstance(tau_spec, tuple) and tau_spec and tau_spec[0] == "nsplit":
            _, perm, m, tau_hi, tau_lo = tau_spec
            # The lane permutation is folded into the PARAMETERS (x_proj's
            # B/C row blocks below and A's state columns): parameter-sized
            # gathers whose backward is a parameter-sized scatter, instead
            # of gathering the (B, 2, N, Lp) Bs/Cs activation cubes every
            # step (and scattering their cotangents back) -- bit-identical
            # operands reach the kernel either way. Parts are then
            # contiguous N slices.
            scan_perm = list(perm)
            if os.environ.get("MEDMAMBA_NSPLIT_FUSED", "1") != "0":
                n_parts = ((None, (m, tau_hi, tau_lo)),)
            else:
                n_parts = (((0, m), tau_hi), ((m, n), tau_lo))
        else:
            n_parts = ((None, tau_spec),)
        As_scan = As if scan_perm is None else As[:, :, scan_perm]

        # Both direction-pairs' projections in ONE batched dot each: weight
        # index layout is [pair j][direction k] (dir 0/1 data feeds weights
        # 0/1 forward and 2/3 reversed), so reshaping the stacked (4, ...)
        # parameters to (2, 2, ...) pairs each weight with its data slice.
        # vs the previous per-pair einsums this halves the dot launches and
        # doubles the x_proj dot's output rows (2c: better MXU row tiling at
        # c = dt_rank + 2n ~ 38); per-output-element contraction order is
        # unchanged (bit-identical results).
        wp4 = x_proj_weight.reshape(2, 2, dt_rank + 2 * n, d_inner)
        if scan_perm is not None:
            wp4 = wp4[:, :, [*range(dt_rank),
                             *(dt_rank + p for p in scan_perm),
                             *(dt_rank + n + p for p in scan_perm)], :]
        x_dbl = jnp.einsum("bkdl,jkcd->bjkcl", xs, wp4.astype(xs.dtype))
        dts4, Bs4, Cs4 = jnp.split(x_dbl, [dt_rank, dt_rank + n], axis=3)
        wdt4 = dt_projs_weight.reshape(2, 2, d_inner, dt_rank)
        dts4 = jnp.einsum("bjkrl,jkdr->bjkdl", dts4, wdt4.astype(dts4.dtype))

        def scan_pair(j, rev):  # j = 0: dirs (0, 1) fwd | 1: dirs (2, 3) rev
            ks = (2 * j, 2 * j + 1)
            dts, Bs, Cs = dts4[:, j], Bs4[:, j], Cs4[:, j]
            if self.is_mutable_collection("scan_stats"):
                # budgets are sown in CANONICAL lane order (dts is
                # permutation-free and As is the unpermuted parameter), so
                # tau_select's emitted perm always refers to canonical lanes
                self._sow_seg_budgets(dts, bias_f[ks[0]:ks[1] + 1],
                                      As[ks[0]:ks[1] + 1], valid_len=vlen)
            A2 = As_scan[ks[0]:ks[1] + 1]
            y = None
            for idx, tau_c in n_parts:
                yk = selective_scan(
                    u, dts.reshape(b, 2 * d_inner, lpad),
                    (A2 if idx is None
                     else A2[:, :, idx[0]:idx[1]]).reshape(2 * d_inner, -1),
                    Bs if idx is None else Bs[:, :, idx[0]:idx[1]],
                    Cs if idx is None else Cs[:, :, idx[0]:idx[1]],
                    # the D*u skip term belongs to the whole output: first
                    # part only (None = zeros for the rest)
                    Ds_f[ks[0]:ks[1] + 1].reshape(-1) if y is None else None,
                    delta_bias=bias_f[ks[0]:ks[1] + 1].reshape(-1),
                    delta_softplus=True, impl=self.scan_impl,
                    reverse_dirs=(rev, rev), tau=tau_c,
                    out_dtype=self.dtype, valid_len=vlen,
                )
                y = yk if y is None else y + yk
            # (B, 2*D, Lp) block dtype, buffer order
            # the scan CORE stays fp32 (reference contract); in bf16 block
            # mode the kernel emits y already in bf16 (bit-identical to the
            # cast this line used to apply, half the y-write/gy-read HBM
            # traffic) and the merge/transpose/out_norm chain that follows
            # runs in the block dtype; fp32 mode unchanged
            return y.reshape(b, 2, d_inner, lpad).astype(self.dtype)

        y = cross_merge_fr(scan_pair(0, False), scan_pair(1, True),
                           h, w)  # (B, D, L)
        y = jnp.transpose(y, (0, 2, 1)).reshape(b, h, w, d_inner)
        # out_norm statistics in fp32 even in bf16 block mode: torch runs
        # LayerNorm in fp32 under AMP autocast, and mean/var of bf16
        # activations lose ~3 digits (ADVICE r2). The surrounding chain stays
        # in block dtype (the cast below restores it), so the bandwidth win of
        # the bf16 merge/transpose path is kept; only the fused normalization
        # arithmetic is promoted.
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="out_norm")(y)
        y = y.astype(self.dtype) * nn.silu(z)
        out = nn.Dense(self.d_model, use_bias=self.bias, kernel_init=trunc_normal_02,
                       dtype=self.dtype, name="out_proj")(y)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """ShuffleNet channel shuffle on NHWC (MedMamba.py:308-320)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class SSConvSSM(nn.Module):
    """The SS-Conv-SSM hybrid block (MedMamba.py:322-357).

    Channel-split halves: right half -> LN -> SS2D -> DropPath; left half ->
    BN-Conv3x3-BN-ReLU-Conv3x3-BN-ReLU-Conv1x1-ReLU; concat -> channel_shuffle(2)
    -> residual add of the whole input.
    """

    hidden_dim: int
    drop_path: float = 0.0
    attn_drop_rate: float = 0.0
    d_state: int = 16
    dtype: Dtype = jnp.float32
    scan_impl: str = "auto"
    scan_tau: Any = None  # int | ('nsplit', perm, m, tau_hi, tau_lo)

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 mask: Optional[jnp.ndarray] = None):  # (B, H, W, C)
        half = self.hidden_dim // 2
        left, right = jnp.split(x, 2, axis=-1)

        r = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(right)
        r = SS2D(d_model=half, d_state=self.d_state, dropout=self.attn_drop_rate,
                 dtype=self.dtype, scan_impl=self.scan_impl,
                 scan_tau=self.scan_tau,
                 name="self_attention")(r, deterministic=deterministic)
        r = DropPath(self.drop_path, name="drop_path")(r, deterministic=deterministic)

        bn = lambda nm: MaskedBatchNorm(use_running_average=deterministic,
                                        momentum=0.9, epsilon=1e-5,
                                        dtype=self.dtype, name=nm)
        conv = lambda kxk, nm: nn.Conv(half, (kxk, kxk), padding="SAME",
                                       kernel_init=kaiming_fan_out,
                                       bias_init=nn.initializers.zeros,
                                       dtype=self.dtype, name=nm)
        c = bn("conv_bn0")(left, mask)
        c = conv(3, "conv3x3_0")(c)
        c = bn("conv_bn1")(c, mask)
        c = nn.relu(c)
        c = conv(3, "conv3x3_1")(c)
        c = bn("conv_bn2")(c, mask)
        c = nn.relu(c)
        c = conv(1, "conv1x1")(c)
        c = nn.relu(c)

        # concat + channel_shuffle(groups=2) == interleave the two halves
        # channel-wise (out[..., 2j] = c[..., j], out[..., 2j+1] = r[..., j]).
        # Emitting the interleave directly as ONE stack+reshape skips the
        # materialized concat and the shuffle's reshape-swap-reshape chain
        # (bit-identical; pinned by test_channel_shuffle_interleave_identity).
        b_, h_, w_, _ = x.shape
        out = jnp.stack([c, r], axis=-1).reshape(b_, h_, w_, self.hidden_dim)
        return out + x


class VSSLayer(nn.Module):
    """One stage: depth x SSConvSSM (+ optional PatchMerging2D), MedMamba.py:359-422."""

    dim: int
    depth: int
    d_state: int = 16
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    downsample: bool = False
    use_checkpoint: bool = False
    dtype: Dtype = jnp.float32
    scan_impl: str = "auto"
    scan_tau: Any = None  # int | ('nsplit', perm, m, tau_hi, tau_lo)

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 mask: Optional[jnp.ndarray] = None):
        block_cls = SSConvSSM
        if self.use_checkpoint:
            block_cls = nn.remat(SSConvSSM, static_argnums=(2,))
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = block_cls(
                hidden_dim=self.dim, drop_path=dp, attn_drop_rate=self.attn_drop,
                d_state=self.d_state, dtype=self.dtype, scan_impl=self.scan_impl,
                scan_tau=self.scan_tau,
                name=f"blocks_{i}",
            )(x, deterministic, mask)
        if self.downsample:
            x = PatchMerging2D(dtype=self.dtype, name="downsample")(x)
        return x


class VSSM(nn.Module):
    """MedMamba top model (MedMamba.py:423-515).

    Input NHWC (B, H, W, 3); output logits (B, num_classes).
    """

    patch_size: int = 4
    num_classes: int = 1000
    depths: Sequence[int] = (2, 2, 4, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: Optional[int] = 16
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    use_checkpoint: bool = False
    dtype: Dtype = jnp.float32
    scan_impl: str = "auto"
    # int (all stages), a per-stage sequence, or an ("nsplit", perm, m,
    # tau_hi, tau_lo) mixed-tau spec (also valid per stage) picked by
    # train.tau_select; None = env default (tau=16).
    scan_tau: Any = None

    def setup(self):
        num_layers = len(self.depths)
        d_state = (math.ceil(self.dims[0] / 6)
                   if self.d_state is None else self.d_state)
        self.patch_embed = PatchEmbed2D(
            patch_size=self.patch_size, embed_dim=self.dims[0],
            patch_norm=self.patch_norm, dtype=self.dtype)
        if self.drop_rate > 0.0:
            self.pos_drop = nn.Dropout(self.drop_rate)
        dpr = self._stage_dpr()
        taus = self.scan_tau
        if (taus is None or isinstance(taus, int)
                or (isinstance(taus, tuple) and taus
                    and taus[0] == "nsplit")):  # one spec for every stage
            taus = (taus,) * num_layers
        self.layers = [
            VSSLayer(
                dim=self.dims[i], depth=self.depths[i], d_state=d_state,
                attn_drop=self.attn_drop_rate,
                drop_path=dpr[sum(self.depths[:i]):sum(self.depths[:i + 1])],
                downsample=i < num_layers - 1,
                use_checkpoint=self.use_checkpoint, dtype=self.dtype,
                scan_impl=self.scan_impl, scan_tau=taus[i])
            for i in range(num_layers)]
        self.head = nn.Dense(self.num_classes, kernel_init=trunc_normal_02,
                             bias_init=nn.initializers.zeros, dtype=self.dtype)

    def __call__(self, x, deterministic: bool = True,
                 mask: Optional[jnp.ndarray] = None):
        x = self.backbone(x, deterministic, mask)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1) over NHWC
        x = self.head(x)
        return x.astype(jnp.float32)

    @nn.nowrap
    def _stage_dpr(self):
        # Linear stochastic-depth decay over all blocks (MedMamba.py:450).
        total = sum(self.depths)
        if total == 1:
            return [0.0]
        return [self.drop_path_rate * i / (total - 1) for i in range(total)]

    def forward_backbone(self, x, deterministic: bool = True):
        """Feature extractor (API parity with VSSM.forward_backbone,
        MedMamba.py:499-507): usable as ``model.apply(vars, x,
        method=VSSM.forward_backbone)``. Returns the final NHWC feature map."""
        return self.backbone(x, deterministic)

    def backbone(self, x, deterministic: bool = True,
                 mask: Optional[jnp.ndarray] = None):
        x = self.patch_embed(x.astype(self.dtype))
        if self.drop_rate > 0.0:
            x = self.pos_drop(x, deterministic)
        for layer in self.layers:
            x = layer(x, deterministic, mask)
        return x
