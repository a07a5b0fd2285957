"""Host-side scan-tau selection (round-3): budgets, caps, adversarial fallback.

The selection gate is the kernel exactness bound |A * seg_sum(dt)| <= 2*CLIP
per tau-aligned segment (ops/pallas_scan.py). These tests run the real
calibration path (SS2D sows into ``scan_stats``) on CPU -- the sow is
impl-independent, so no TPU needed.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from medmamba_tpu.models.vssm import VSSM, SCAN_TAU_CANDIDATES
from medmamba_tpu.train.tau_select import (
    SAFE_FLOOR, _packing_cap, measure_seg_budgets, select_scan_tau)
from medmamba_tpu.ops.pallas_scan import _CLIP


def _tiny_model(**kw):
    return VSSM(num_classes=3, depths=(1, 1), dims=(16, 32), d_state=4,
                drop_path_rate=0.0, scan_impl="assoc", **kw)


def _init(model, img=32, seed=0):
    rng = jax.random.key(seed)
    x = jnp.zeros((2, img, img, 3), jnp.float32)
    variables = model.init({"params": rng,
                            "dropout": jax.random.fold_in(rng, 1)}, x, True)
    return variables["params"], variables.get("batch_stats", {})


def test_packing_cap():
    # L=49 (stage 4 at 224): tau<=64 keeps the tau=16 packing pitch of 64
    assert _packing_cap(49) == 64
    # L=20: pitch 32 -> cap 32
    assert _packing_cap(20) == 32
    # unpacked stages (pitch >= chunk): no cap
    assert _packing_cap(196) == 128
    assert _packing_cap(3136) == 128


def test_budgets_measured_per_stage_and_monotone():
    model = _tiny_model()
    params, bs = _init(model)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))
    budgets = measure_seg_budgets(model, params, bs, x)
    assert set(budgets) == {0, 1}
    for b in budgets.values():
        assert b.shape == (len(SCAN_TAU_CANDIDATES), model.d_state)
        assert np.all(b > 0)
        # seg sums grow with tau, so budgets are non-decreasing per lane
        assert np.all(np.diff(b, axis=0) >= -1e-5)


def test_select_falls_back_on_adversarial_magnitudes():
    """Force dt >> safe: inflate every dt_projs_bias so softplus(bias) is
    huge; the selector must refuse every larger tau and return the floor."""
    model = _tiny_model()
    params, bs = _init(model)
    big = jax.tree_util.tree_map_with_path(
        lambda p, v: (jnp.full_like(v, 50.0)
                      if any(getattr(k, "key", None) == "dt_projs_bias"
                             for k in p) else v), params)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))
    taus = select_scan_tau(model, big, bs, x, image_size=32)
    assert taus == (SAFE_FLOOR,) * 2
    # sanity: the measured budgets really do exceed the gate (every lane --
    # no nsplit escape hatch either)
    budgets = measure_seg_budgets(model, big, bs, x)
    assert all(np.min(b[0]) > 2 * _CLIP for b in budgets.values())


def test_select_picks_larger_tau_when_safe():
    """Shrink dt (very negative bias -> softplus ~ 0): every candidate fits
    the clip budget, so each stage gets its packing-capped maximum."""
    model = _tiny_model()
    params, bs = _init(model)
    tiny = jax.tree_util.tree_map_with_path(
        lambda p, v: (jnp.full_like(v, -12.0)
                      if any(getattr(k, "key", None) == "dt_projs_bias"
                             for k in p) else v), params)
    x = 0.01 * jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))
    taus = select_scan_tau(model, tiny, bs, x, image_size=32)
    # stages at 32px: L = 64 (8x8), 16 (4x4) -> packing caps 64, 16
    assert taus == (_packing_cap(64), _packing_cap(16))
    assert taus[0] > SAFE_FLOOR  # actually upgraded, not floored


def test_pick_stage_tau_policy():
    """The mixed-tau n-split policy on synthetic per-n budget matrices."""
    from medmamba_tpu.train.tau_select import N_GRANULE, _pick_stage_tau

    limit = 144.0
    n = 16
    lanes = np.arange(1, n + 1, dtype=np.float32) / n  # |A_n| ~ n at init

    # every lane fits tau=128 -> plain int (no pointless split)
    b = np.stack([30 * lanes, 60 * lanes, 120 * lanes])
    assert _pick_stage_tau(b, cap=128, limit=limit) == 128

    # the measured init regime: tau=64 fits all lanes, tau=128 only for
    # n <= 11 -> 8 lanes split off at 128, the rest (the worst 8) stay at 64
    b = np.stack([51 * lanes, 102 * lanes, 204 * lanes])
    spec = _pick_stage_tau(b, cap=128, limit=limit)
    assert spec[0] == "nsplit" and spec[2:] == (N_GRANULE, 128, 64)
    perm = spec[1]
    assert sorted(perm) == list(range(n))
    # the m best-budget lanes split off; parts are canonically sorted so
    # within-part jitter across recalibrations cannot change the spec
    order = np.argsort(b[2], kind="stable")
    assert list(perm) == sorted(order[:N_GRANULE]) + sorted(order[N_GRANULE:])
    # within-part reorderings of the budget produce the SAME spec
    b_jitter = b.copy()
    b_jitter[2][[0, 1]] = b_jitter[2][[1, 0]]  # both in the hi part
    assert _pick_stage_tau(b_jitter, cap=128, limit=limit) == spec

    # fewer than N_GRANULE lanes fit the larger tau -> no split
    b = np.stack([51 * lanes, 102 * lanes, 500 * lanes])
    assert _pick_stage_tau(b, cap=128, limit=limit) == 64

    # the packing cap gates split candidates exactly like plain ones
    b = np.stack([51 * lanes, 102 * lanes, 204 * lanes])
    assert _pick_stage_tau(b, cap=64, limit=limit) == 64
    # cap 64 with some lanes over at 64 -> split 64/32
    b = np.stack([51 * lanes, 204 * lanes, 500 * lanes])
    spec = _pick_stage_tau(b, cap=64, limit=limit)
    assert spec[0] == "nsplit" and spec[2:] == (N_GRANULE, 64, 32)

    # no measurement -> the safe floor
    assert _pick_stage_tau(None, cap=128, limit=limit) == SAFE_FLOOR

    # small/odd d_state: never split (sublane padding would eat the win)
    b = np.stack([51 * np.ones(4), 102 * np.ones(4), 204 * np.ones(4)])
    assert _pick_stage_tau(b, cap=128, limit=limit) == 64


def test_pick_stage_tau_prefers_wider_mid_tau_coverage():
    """The spec is chosen by modeled cost, not by largest tau_hi: 8 lanes
    @128 + 56 @32 must lose to 56 @64 + 8 @32 (code-review round-3 finding:
    the old policy always took the largest fitting candidate as tau_hi)."""
    from medmamba_tpu.train.tau_select import _pick_stage_tau

    n = 64
    b32 = np.full(n, 100.0, np.float32)   # tau=32 fits every lane
    b64 = np.full(n, 120.0, np.float32)
    b64[-8:] = 500.0                      # 56 lanes fit tau=64
    b128 = np.full(n, 500.0, np.float32)
    b128[:8] = 120.0                      # only 8 lanes fit tau=128
    spec = _pick_stage_tau(np.stack([b32, b64, b128]), cap=128, limit=144.0)
    assert spec[0] == "nsplit" and spec[2:] == (56, 64, 32)
    # and when tau=128 coverage is wide, the large-hi split still wins
    b128_wide = np.full(n, 120.0, np.float32)
    b128_wide[-8:] = 500.0
    b64_all = np.full(n, 120.0, np.float32)
    spec = _pick_stage_tau(np.stack([b32, b64_all, b128_wide]),
                           cap=128, limit=144.0)
    assert spec[0] == "nsplit" and spec[2:] == (56, 128, 64)


def test_budget_filter_ignores_foreign_scan_stats_leaves(monkeypatch):
    """measure_seg_budgets must key on the sown name 'seg_budget', not on
    leaf shape: with the diagnostic per-(d, n) sow enabled the collection
    carries extra 2-D leaves that must not merge into the budget matrix."""
    model = _tiny_model()
    params, bs = _init(model)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))
    from medmamba_tpu.train.tau_select import _calib_fn

    clean = measure_seg_budgets(model, params, bs, x)
    # the calibration jit is lru-cached and the sow flag is read at trace
    # time: clear so the diagnostic leaves actually appear (and clear again
    # after, so the diagnostic trace never leaks into other tests)
    _calib_fn.cache_clear()
    monkeypatch.setenv("MEDMAMBA_SOW_DN_BUDGETS", "1")
    try:
        with_dn = measure_seg_budgets(model, params, bs, x)
    finally:
        _calib_fn.cache_clear()
    for s in clean:
        np.testing.assert_array_equal(clean[s], with_dn[s])


def test_nsplit_model_matches_unsplit():
    """A model cloned with an nsplit spec produces the same outputs and
    gradients as the plain-tau model (exercises the SS2D split call path:
    n-permutation, A/B/C slicing, single D*u term, partial-y add). The assoc
    impl ignores tau, so any difference would be a split-wiring bug."""
    m_plain = _tiny_model()
    spec = ("nsplit", (2, 0, 3, 1), 2, 64, 16)
    m_split = m_plain.clone(scan_tau=(spec, 16))
    params, bs = _init(m_plain)
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))

    def loss(m, p):
        y = m.apply({"params": p, "batch_stats": bs}, x, True)
        return jnp.sum(y ** 2), y

    (l0, y0), g0 = jax.value_and_grad(lambda p: loss(m_plain, p),
                                      has_aux=True)(params)
    (l1, y1), g1 = jax.value_and_grad(lambda p: loss(m_split, p),
                                      has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5), g1, g0)


def test_model_scan_tau_is_static_config():
    """Per-stage scan_tau threads to SS2D and changes the apply identity
    (clone -> retrace), while params stay interchangeable."""
    m16 = _tiny_model()
    m64 = m16.clone(scan_tau=(64, 16))
    params, bs = _init(m16)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    y16 = m16.apply({"params": params, "batch_stats": bs}, x, True)
    y64 = m64.apply({"params": params, "batch_stats": bs}, x, True)
    # assoc impl ignores tau: numerics identical, proving param compatibility
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y64), atol=1e-6)


def test_calibration_uses_batch_statistics_not_running_averages():
    """The budgets gate TRAINING steps, which run BatchNorm on batch stats;
    calibration must measure the same activation distribution. Pin this by
    poisoning the running averages: batch-stats-mode budgets are invariant,
    eval-mode budgets would not be (round-3 review finding)."""
    model = _tiny_model()
    params, bs = _init(model)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))
    clean = measure_seg_budgets(model, params, bs, x)
    poisoned = jax.tree_util.tree_map_with_path(
        lambda p, v: (jnp.full_like(v, 1e6)
                      if any(getattr(k, "key", None) == "var" for k in p)
                      else v), bs)
    dirty = measure_seg_budgets(model, params, poisoned, x)
    for s in clean:
        np.testing.assert_allclose(dirty[s], clean[s], rtol=1e-5)


def test_calibration_jit_is_cached_across_recalibrations():
    """Per-epoch recalibration must reuse one XLA executable: equal canonical
    clones (whatever tau the live model currently runs) hit the lru cache."""
    from medmamba_tpu.train.tau_select import _calib_fn

    model = _tiny_model()
    params, bs = _init(model)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    before = _calib_fn.cache_info().hits
    measure_seg_budgets(model, params, bs, x)
    measure_seg_budgets(model.clone(scan_tau=(64, 16)), params, bs, x)
    measure_seg_budgets(model.clone(scan_tau=(128, 64)), params, bs, x)
    assert _calib_fn.cache_info().hits >= before + 2


def test_calibration_handles_remat_model():
    """use_checkpoint=True models calibrate via the canonical plain clone
    (sow-through-remat never has to work)."""
    model = _tiny_model(use_checkpoint=True)
    params, bs = _init(model)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    budgets = measure_seg_budgets(model, params, bs, x)
    assert set(budgets) == {0, 1}


def test_eval_mode_calibration_is_deterministic_forward():
    """Serving-side selection (train_mode=False) gates EVAL forwards: the
    calibration must run with deterministic=True -- DropPath is identity
    regardless of rate (the same flag drives running-average BatchNorm).
    Train-mode calibration at rate 0.9 would zero most residual branches and
    produce very different budgets; eval-mode budgets must be rate-invariant.
    (Running-stats sensitivity can't pin the mode here: downstream LayerNorms
    wash BN-scale perturbations out of the measured dt.)"""
    model = _tiny_model()
    params, bs = _init(model)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))
    clean = measure_seg_budgets(model, params, bs, x, train_mode=False)
    assert set(clean) == {0, 1}
    spicy = measure_seg_budgets(model.clone(drop_path_rate=0.9), params, bs,
                                x, train_mode=False)
    for s in clean:
        np.testing.assert_allclose(spicy[s], clean[s], rtol=1e-5)


def test_nsplit_fused_matches_two_launch_in_model(monkeypatch):
    """SS2D's default nsplit realization (ONE fused kernel launch with
    tau=(m, tau_hi, tau_lo)) matches the two-launch split
    (MEDMAMBA_NSPLIT_FUSED=0) on the Pallas kernel path, outputs and grads.
    Companion of the kernel-level tests in test_selective_scan.py -- this one
    goes through the SS2D permutation/call wiring."""
    spec = ("nsplit", (2, 0, 3, 1), 2, 32, 16)
    model = _tiny_model().clone(scan_impl="pallas", scan_tau=(spec, 16))
    params, bs = _init(model)
    x = jnp.asarray(np.random.default_rng(11).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))

    def run():
        def loss(p):
            y = model.apply({"params": p, "batch_stats": bs}, x, True)
            return jnp.sum(y ** 2), y

        (_, y), g = jax.value_and_grad(loss, has_aux=True)(params)
        return y, g

    monkeypatch.delenv("MEDMAMBA_NSPLIT_FUSED", raising=False)
    y_fused, g_fused = run()
    monkeypatch.setenv("MEDMAMBA_NSPLIT_FUSED", "0")
    y_two, g_two = run()
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_two),
                               rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        g_fused, g_two)


def test_tau_hysteresis_debounces_changes():
    """VERDICT r4 #5: one epoch of budget jitter around a threshold must not
    thrash retraces. Raises need raise_after consecutive identical
    proposals; drops switch per drop_after; different proposals reset the
    streak; the first proposal is always adopted."""
    from medmamba_tpu.train.tau_select import TauHysteresis, taus_cost

    # cost ordering sanity: larger tau = faster; nsplit between its parts
    assert taus_cost((128, 128)) < taus_cost((64, 64)) < taus_cost((16, 16))
    ns = ("nsplit", tuple(range(16)), 8, 128, 64)
    assert taus_cost((128,)) < taus_cost((ns,)) < taus_cost((64,))

    h = TauHysteresis(drop_after=1, raise_after=2)
    assert h.propose((64, 64)) == ((64, 64), True)      # initial: adopt
    assert h.propose((64, 64)) == ((64, 64), False)     # steady
    assert h.propose((128, 64)) == ((64, 64), False)    # raise, streak 1/2
    assert h.propose((64, 64)) == ((64, 64), False)     # jitter: reset
    assert h.propose((128, 64)) == ((64, 64), False)    # raise, streak 1/2
    assert h.propose((128, 64)) == ((128, 64), True)    # raise, streak 2/2
    assert h.propose((16, 64)) == ((16, 64), True)      # drop: immediate

    h2 = TauHysteresis(drop_after=2, raise_after=2)
    h2.propose((128, 128))
    assert h2.propose((64, 128)) == ((128, 128), False)  # drop, streak 1/2
    assert h2.propose((32, 128)) == ((128, 128), False)  # DIFFERENT drop: reset
    assert h2.propose((32, 128)) == ((32, 128), True)    # streak 2/2


def test_outcome_gate_limits_and_guard():
    """Round-5 outcome gate: budget limit is the measured-outcome bound, not
    bit-exactness; the trained-regime budgets (~205, ROUND5_NOTES) admit
    tau=128 under it while the exact gate refuses; and selecting with
    gate='outcome' at the default (overflow-hazard) clip 80 raises."""
    import numpy as np
    import pytest as _pytest

    from medmamba_tpu.train import tau_select as ts

    assert ts._stage_budget_limit("exact", 0.9) == _pytest.approx(
        0.9 * 2 * ts._CLIP)
    assert ts._stage_budget_limit("outcome", 0.9) == _pytest.approx(
        0.9 * ts.OUTCOME_BUDGET_LIMIT)
    with _pytest.raises(ValueError):
        ts._stage_budget_limit("bogus", 0.9)

    # the round-4/5 trained regime: per-(tau32,64,128) budgets ~[51,102,204]
    b = np.tile(np.array([[51.0], [102.0], [204.0]]), (1, 16))
    exact = ts._pick_stage_tau(b, cap=128,
                               limit=ts._stage_budget_limit("exact", 0.9))
    outcome = ts._pick_stage_tau(b, cap=128,
                                 limit=ts._stage_budget_limit("outcome", 0.9))
    assert outcome == 128                      # the fast regime
    assert exact != 128                        # bit-exact gate refuses flat 128

    # clip-consistency guard: outcome gate at clip 80 must refuse outright
    if ts._CLIP > ts.OUTCOME_SCAN_CLIP:
        with _pytest.raises(RuntimeError, match="MEDMAMBA_SCAN_CLIP"):
            ts.select_scan_tau(None, None, None, None, gate="outcome")


def test_forced_tau_respects_packing_cap():
    """packing_cap clamps forced int taus at short-L stages (fixes the
    forced-128 batch-256 HBM OOM, VERDICT r4 #4)."""
    from medmamba_tpu.ops.pallas_scan import packing_cap

    assert packing_cap(49) == 64      # 7x7 stage: pitch16 = 64
    assert packing_cap(196) == 128    # 14x14: pitch16 208 >= chunk, no cap
    assert packing_cap(3136) == 128   # unpacked
    assert packing_cap(16) == 16      # single tiny element: floor
