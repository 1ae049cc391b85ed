"""int8 quantized inference (nn/quant.py): param-tree compatibility and
mask agreement vs the f32 path — the same gate bf16 passed
(tests/test_model_parity.py::test_bf16_inference_mask_parity pattern)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosnet_tpu.nn import quant
from cosnet_tpu.nn.raa import RGBDSegmentationRAA
from cosnet_tpu.nn.resnet import Bottleneck


@pytest.fixture(autouse=True)
def _reset_switch():
    yield
    quant.disable_int8()


def _tiny(dtype=jnp.float32):
    return RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=[1, 1, 1, 1],
                               num_blocks_depth=[1, 1, 1, 1], dtype=dtype)


def _inputs(seed=5, hw=(32, 32)):
    rng = np.random.default_rng(seed)
    # image-scale inputs (mean-subtracted BGR range) — quantization error is
    # relative to the tensor max, so test at realistic magnitudes
    rgb = rng.uniform(-120, 130, (2, *hw, 3)).astype(np.float32)
    d = rng.uniform(0, 255, (2, *hw, 1)).astype(np.float32)
    return rgb, rng.uniform(-120, 130, (2, *hw, 3)).astype(np.float32), d, d[::-1].copy()


def test_quantconv_param_tree_matches_nn_conv():
    model = _tiny()
    a, b, da, db = _inputs()
    v_f32 = model.init(jax.random.key(0), a, b, da, db, train=False)
    quant.enable_int8()
    v_int8 = _tiny().init(jax.random.key(0), a, b, da, db, train=False)
    quant.disable_int8()
    paths_f32 = {jax.tree_util.keystr(p): v.shape
                 for p, v in jax.tree_util.tree_leaves_with_path(v_f32)}
    paths_i8 = {jax.tree_util.keystr(p): v.shape
                for p, v in jax.tree_util.tree_leaves_with_path(v_int8)}
    assert paths_f32 == paths_i8  # any checkpoint loads on either path


def test_int8_mask_agreement_vs_f32():
    model = _tiny()
    a, b, da, db = _inputs()
    variables = model.init(jax.random.key(1), a, b, da, db, train=False)
    x_f32, _, _ = model.apply(variables, a, b, da, db, train=False)
    m_f32 = (np.asarray(x_f32) * 255).astype(np.uint8)

    quant.enable_int8()
    try:
        x_i8, _, _ = _tiny().apply(variables, a, b, da, db, train=False)
    finally:
        quant.disable_int8()
    m_i8 = (np.asarray(x_i8) * 255).astype(np.uint8)

    close = np.mean(np.abs(m_f32.astype(np.int16) - m_i8.astype(np.int16)) <= 2)
    assert close > 0.99, close  # uint8-scale agreement (bf16-gate pattern)


def test_quantconv_matches_f32_conv_closely():
    """Layer-level: int8 conv ~= f32 conv within the 8-bit resolution."""
    from cosnet_tpu.nn.quant import QuantConv
    import flax.linen as nn

    rng = np.random.default_rng(0)
    x = rng.uniform(-50, 50, (2, 16, 16, 32)).astype(np.float32)
    conv = nn.Conv(features=64, kernel_size=(3, 3), padding=((1, 1), (1, 1)), use_bias=False)
    v = conv.init(jax.random.key(2), x)
    qconv = QuantConv(features=64, kernel_size=(3, 3), padding=((1, 1), (1, 1)), use_bias=False)
    y = np.asarray(conv.apply(v, x))
    yq = np.asarray(qconv.apply(v, x))
    # error budget: |y-yq| <= (|x|max·dw + |w|max·dx)-ish; empirically ~1e-2
    # of the output range for 8-bit symmetric quantization
    denom = np.abs(y).max()
    assert np.abs(y - yq).max() / denom < 0.02


def _static_variables(variables, amax):
    import jax.numpy as jnp

    return dict(variables, quant_scales=jax.tree.map(
        jnp.asarray, quant.scales_variables(amax)))


def test_int8_static_scales_match_dynamic():
    """Static calibrated scales (the residual-stream form: requantize folded
    into the producer epilogue) must agree with the dynamic path when
    calibrated on the same batch — per-input-channel scales are a finer
    partition of the same observed range, so masks agree at uint8 scale."""
    model = _tiny()
    a, b, da, db = _inputs()
    variables = model.init(jax.random.key(1), a, b, da, db, train=False)

    quant.enable_int8()
    try:
        amax = quant.collect_amax(model, variables, (a, b, da, db), train=False)
        assert amax and all(np.all(v >= 0) for v in amax.values())
        # per-channel vectors: conv sites carry one range per input channel
        assert any(v.size > 1 for v in amax.values())
        x_dyn, _, _ = _tiny().apply(variables, a, b, da, db, train=False)
        quant.enable_int8(static=True)
        x_sta, _, _ = _tiny().apply(_static_variables(variables, amax),
                                    a, b, da, db, train=False)
    finally:
        quant.disable_int8()
    m_dyn = (np.asarray(x_dyn) * 255).astype(np.uint8)
    m_sta = (np.asarray(x_sta) * 255).astype(np.uint8)
    close = np.mean(np.abs(m_dyn.astype(np.int16) - m_sta.astype(np.int16)) <= 2)
    assert close > 0.99, close


def test_int8_static_missing_sites_fall_back_to_dynamic():
    """A site dropped from the calibration dict (mixed static/dynamic —
    the drift-bisection escape hatch) must run with dynamic scales instead
    of failing; the output still agrees with the all-dynamic path."""
    model = _tiny()
    a, b, da, db = _inputs()
    variables = model.init(jax.random.key(1), a, b, da, db, train=False)

    quant.enable_int8()
    try:
        amax = quant.collect_amax(model, variables, (a, b, da, db), train=False)
        x_dyn, _, _ = _tiny().apply(variables, a, b, da, db, train=False)
        # drop every encoder site -> those fall back to dynamic at runtime
        kept = {k: v for k, v in amax.items() if "depth" in k}
        assert 0 < len(kept) < len(amax)
        quant.enable_int8(static=True)
        x_mix, _, _ = _tiny().apply(_static_variables(variables, kept),
                                    a, b, da, db, train=False)
    finally:
        quant.disable_int8()
    m_dyn = (np.asarray(x_dyn) * 255).astype(np.uint8)
    m_mix = (np.asarray(x_mix) * 255).astype(np.uint8)
    close = np.mean(np.abs(m_dyn.astype(np.int16) - m_mix.astype(np.int16)) <= 2)
    assert close > 0.99, close


def test_int8_static_recalibration_reuses_compiled_forward():
    """Scales are RUNTIME inputs (the quant_scales collection), so feeding
    new calibration values must hit the same compiled executable — the
    property serve.py's per-job recalibration relies on."""
    model = _tiny()
    a, b, da, db = _inputs()
    variables = model.init(jax.random.key(1), a, b, da, db, train=False)

    quant.enable_int8()
    try:
        amax1 = quant.collect_amax(model, variables, (a, b, da, db), train=False)
        a2, b2, da2, db2 = _inputs(seed=11)
        amax2 = quant.collect_amax(model, variables, (a2, b2, da2, db2), train=False)
        quant.enable_int8(static=True)
        fwd = jax.jit(lambda v, *ins: _tiny().apply(v, *ins, train=False)[0])
        fwd(_static_variables(variables, amax1), a, b, da, db).block_until_ready()
        n_compiles = fwd._cache_size()
        fwd(_static_variables(variables, amax2), a, b, da, db).block_until_ready()
        assert fwd._cache_size() == n_compiles  # same structure -> no retrace
    finally:
        quant.disable_int8()


def test_merge_amax_elementwise_max():
    a = {"s1": np.array([1.0, 5.0]), "s2": np.array([2.0])}
    b = {"s1": np.array([3.0, 4.0]), "s3": np.array([7.0])}
    m = quant.merge_amax(a, b)
    np.testing.assert_allclose(m["s1"], [3.0, 5.0])
    np.testing.assert_allclose(m["s2"], [2.0])
    np.testing.assert_allclose(m["s3"], [7.0])


def test_collect_amax_zero_sites_is_a_clear_error():
    """min_in_channels above every conv width must raise a diagnosable
    error, not a KeyError on a missing stats collection (advisor r4)."""
    model = _tiny()
    a, b, da, db = _inputs()
    variables = model.init(jax.random.key(1), a, b, da, db, train=False)
    quant.enable_int8(min_in_channels=1 << 20)
    try:
        with pytest.raises(ValueError, match="zero quant sites"):
            quant.collect_amax(model, variables, (a, b, da, db), train=False)
    finally:
        quant.disable_int8()


def test_int8_static_drops_activation_max_reduce():
    """The point of static scales: the traced graph must contain NO
    max-reduction over the conv INPUT activations (weight-scale reductions
    remain). Count reduce ops: static mode should have roughly half the
    dynamic mode's (one per conv for weights instead of two)."""
    model = _tiny()
    a, b, da, db = _inputs()
    variables = model.init(jax.random.key(1), a, b, da, db, train=False)

    def n_reduce_max(text):
        return text.count("stablehlo.maximum") + text.count("reduce")

    def lower_text():
        f = jax.jit(lambda v, w, x, y, z: _tiny().apply(v, w, x, y, z, train=False)[0])
        return f.lower(variables, a, b, da, db).as_text()

    quant.enable_int8()
    try:
        amax = quant.collect_amax(model, variables, (a, b, da, db), train=False)
        dyn = lower_text()
        quant.enable_int8(static=True)
        variables = _static_variables(variables, amax)
        sta = lower_text()
    finally:
        quant.disable_int8()
    assert n_reduce_max(sta) < n_reduce_max(dyn)


def test_enable_int8_swaps_convs_in_traced_graph():
    """The trace-time switch must actually reach the built graph — the mask
    agreement gate above passes trivially if the swap silently broke (on a
    fresh-init model the final sigmoid saturates, so masks are bitwise
    identical across f32/bf16/int8 regardless). Lower the jitted forward and
    assert int8 operands exist iff the switch is on."""
    model = _tiny()
    a, b, da, db = _inputs()
    variables = model.init(jax.random.key(1), a, b, da, db, train=False)

    def lower_text():
        f = jax.jit(lambda v, w, x, y, z: _tiny().apply(v, w, x, y, z, train=False)[0])
        return f.lower(variables, a, b, da, db).as_text()

    quant.enable_int8()
    try:
        quantized = lower_text()
    finally:
        quant.disable_int8()
    assert "xi8>" in quantized  # int8 conv operands present
    assert "xi8>" not in lower_text()  # and absent with the switch off
