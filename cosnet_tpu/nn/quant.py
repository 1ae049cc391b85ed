"""int8 quantized inference path (v5e: 394 TOPS int8 vs 197 TFLOP/s bf16).

The eval step is ~87% MXU-bound convs already at bf16 peak
(docs/PERF_r2.md), so int8 is the remaining single-chip throughput lever.
Measured on this chip (benchmarks/int8_probe.py, two-length difference
timing): the ASPP 2048→512 atrous class runs 1.74× faster as s8×s8→s32,
layer3 3×3 2.61×, 1×1 1.51× — XLA does lower int8 ``conv_general_dilated``
onto the int8 MXU path.

Two activation-scale schemes, one parameter tree (same ``kernel``/``bias``
f32 params as ``nn.Conv`` — any checkpoint loads on either path):

**Dynamic** (``enable_int8()``): per-output-channel weight scales
(max|w|/127, from the f32 checkpoint weights at trace time) and a
per-tensor dynamic activation scale (max|x|/127, one VPU reduction per
conv input). No calibration needed; the reduction costs an extra
elementwise read per conv, so only wide convs are net-positive
(``min_in_channels=512`` sweet spot, docs/PERF_r3.md).

**Static** (``enable_int8(static=True)`` + :func:`calibrate_static_int8`
in eval/runner.py): PER-INPUT-CHANNEL activation scales calibrated over
the first K eval batches, carried in a ``quant_scales`` flax variables
collection. Because the scales are *runtime inputs* (tiny [ci] vectors in
the session's variable tree), not trace-time constants:

- recalibration (e.g. per sweep job in serve.py) reuses the already
  compiled executable — same HLO, new scale values, zero retrace;
- scales are scoped to the session/model whose tree carries them — two
  sessions in one process cannot cross-apply each other's calibration
  (the round-4 advisor's ``_STATIC_AMAX`` process-global hazard);
- a site absent from the collection falls back to the dynamic per-tensor
  scale, so mixed static/dynamic coverage (drift bisection, outlier
  sites) is just "drop the site from the calibration dict".

The per-channel quantize is still a pure elementwise chain (multiply by a
broadcast [ci] vector — no reduction over the producer's output), so XLA
fuses it into the producing conv/BN/ReLU epilogue and the activation
crosses HBM as int8 exactly like the scalar-static form did; the channel
scales fold into the *weight* quantization (``w·s_x`` quantized per output
channel), so the MAC and the rescale epilogue are unchanged. Per-channel
granularity removes the outlier-channel error that per-tensor static
scales suffer (the round-4 +1.4e-2 F drift).

BN stays f32 downstream (it consumes the rescaled f32 conv output); the
co-attention kernel, classifiers, and mask decode are untouched — the
trunk/ASPP convs are where the int8 FLOPs are.

Like context parallelism, the switch is trace-time module state
(:func:`enable_int8`) rather than an attribute threaded through every
module: ``resnet._conv`` / ``aspp._biased_conv`` consult it when they
build, swapping ``nn.Conv`` for :class:`QuantConv` with identical
names/param shapes.
"""
from __future__ import annotations

import os
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_INT8 = False
_MIN_IN_CHANNELS = 0
_STATIC = False  # read per-channel scales from the "quant_scales" collection


def enable_int8(min_in_channels: int = 0, static: bool = False):
    """``min_in_channels``: quantize only convs at least this wide on the
    input-channel axis. Full-model measurement (docs/PERF_r3.md): blanket
    dynamic int8 wins just 7% — every conv input pays a quantize pass (an
    extra elementwise read+write), which on the narrow HBM-bound convs
    costs what the MXU saves. The wide convs (2048/1024-ch ASPP +
    layer3/4 entries) are where int8's 1.5-1.7x is net-positive, and the
    ASPP branches share one quantized input (XLA CSEs the identical
    quantize chains).

    ``static``: read CALIBRATED per-input-channel activation ranges from
    the ``quant_scales`` variables collection (see module docstring and
    ``eval/runner.py::calibrate_static_int8``). The quantize becomes a
    pure elementwise chain — no max-reduction over the producer's output —
    so XLA fuses it into the producing conv/BN/ReLU epilogue and the
    activation crosses HBM as int8 (the "residual stream int8" form).
    That removes the narrow-conv overhead, so ``min_in_channels`` can
    drop to cover the whole trunk. Sites missing from the collection run
    with dynamic scales (mixed static/dynamic coverage).

    (A trace-time-constant scale binding was measured and rejected:
    150.5 ms vs the collection form's 150.2 — XLA gains nothing from
    constant scales, and baked constants would force a full retrace per
    recalibration; docs/PERF_r5.md.)"""
    global _INT8, _MIN_IN_CHANNELS, _STATIC
    _INT8 = True
    _MIN_IN_CHANNELS = min_in_channels
    _STATIC = static


def disable_int8():
    global _INT8, _STATIC
    _INT8 = False
    _STATIC = False


def int8_enabled() -> bool:
    return _INT8


def static_enabled() -> bool:
    return _STATIC


def min_in_channels() -> int:
    return _MIN_IN_CHANNELS


def amax_headroom() -> float:
    """Safety margin on calibrated ranges: activations on frames beyond the
    calibration batches may exceed their max|x|; values past the range clip
    to ±127 (symmetric clip — graceful, but headroom delays it).

    Default 1.0 (exact multi-batch max): headroom was the DOMINANT
    int8-static drift term — ΔF vs bf16 on the trained-ckpt fingerprint:
    h1.0 +1.06e-3, h1.05 +6.9e-3, h1.1 +4.58e-3
    (docs/evidence/INT8_BISECT_r05.json; the non-monotonicity shows the
    metric's sensitivity to scale perturbation, not a trend). Multi-batch
    calibration + serve.py's per-job recalibration carry the
    out-of-distribution risk instead. Applied to the calibrated VALUES
    (scales_variables), never at trace time, so sweeps reuse the graph."""
    return float(os.environ.get("COSNET_INT8_HEADROOM", "1.0"))


def channel_floor() -> float:
    """Relative floor on per-channel calibrated ranges: a channel that was
    (near-)dead on the calibration batches would otherwise get a minuscule
    scale that crushes any later activation to ~0 after the symmetric clip.
    Flooring each channel's range at this fraction of the site's max keeps
    such channels representable at the cost of coarser resolution there."""
    return float(os.environ.get("COSNET_INT8_CH_FLOOR", "0.01"))


def collect_amax(model, variables, inputs: tuple, **apply_kwargs) -> dict:
    """One calibration forward: run the model with the ``quant_stats``
    collection mutable and return ``{site_path: per-channel max|x| [ci]}``
    for every quantized conv input site.

    Works from either mode: the stats trace always runs with the dynamic
    branch active (saved/restored around the call) so the sites sow.
    Feed it REPRESENTATIVE batches (e.g. the eval loop's first K
    preprocessed batches, reduced with elementwise max across calls) —
    :func:`scales_variables` turns the result into the ``quant_scales``
    collection the static path reads."""
    global _STATIC
    assert _INT8, "enable_int8 first — otherwise no QuantConv sites exist to calibrate"

    @jax.jit
    def run(v, *ins):
        _, stats = model.apply(v, *ins, mutable=["quant_stats"], **apply_kwargs)
        return stats.get("quant_stats", {})

    variables = {k: v for k, v in variables.items() if k != "quant_scales"}
    return harvest_amax(run, variables, inputs)


def harvest_amax(stats_fn, variables, inputs: tuple) -> dict:
    """Run a jitted stats forward (returning the ``quant_stats`` tree) with
    the dynamic branch forced active, and flatten the sown per-channel
    ranges to ``{site_path: [ci] max|x|}``. Raises if nothing sowed."""
    global _STATIC
    prev_static = _STATIC
    _STATIC = False  # the stats trace must take the sowing (dynamic) branch
    try:
        stats = jax.device_get(stats_fn(variables, *inputs))
    finally:
        _STATIC = prev_static
    flat = {}

    def walk(prefix, node):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(prefix + [k], v)
            elif k == "amax":
                flat["/".join(prefix)] = np.asarray(v, np.float32).reshape(-1)

    walk([], stats)
    if not flat:
        raise ValueError(
            "calibration forward sowed zero quant sites — every conv fell "
            "below min_in_channels (=%d)? Lower COSNET_INT8_MIN_CI or check "
            "that the model actually builds QuantConvs." % _MIN_IN_CHANNELS)
    return flat


def merge_amax(a: dict, b: dict) -> dict:
    """Elementwise-max combine of two :func:`collect_amax` results
    (multi-batch calibration: ranges cover the union of the batches)."""
    out = dict(a)
    for k, v in b.items():
        out[k] = np.maximum(out[k], v) if k in out else v
    return out


def scales_variables(amax_flat: dict, drop_pattern: str = None) -> dict:
    """Build the ``quant_scales`` collection tree from :func:`collect_amax`
    output: ``{site}/amax -> [ci] f32`` with the per-channel relative floor
    applied (:func:`channel_floor`).

    ``drop_pattern`` (default: env ``COSNET_INT8_DYNAMIC_SITES`` regex):
    sites matching it are omitted — they fall back to dynamic per-tensor
    scales at runtime (the drift-bisection / outlier-site escape hatch).

    ``COSNET_INT8_PER_CHANNEL=0`` collapses each site's range to its max
    (per-TENSOR static scales, the round-4 granularity): QuantConv then
    skips the per-channel weight fold — measured ~9 % faster on the step
    (docs/PERF_r5.md) at coarser quantization. Default is per-channel."""
    import re

    pattern = drop_pattern if drop_pattern is not None else os.environ.get(
        "COSNET_INT8_DYNAMIC_SITES", "")
    rx = re.compile(pattern) if pattern else None
    per_channel = os.environ.get("COSNET_INT8_PER_CHANNEL", "1") != "0"
    floor = channel_floor()
    headroom = amax_headroom()
    tree = {}
    for path, arr in amax_flat.items():
        if rx is not None and rx.search(path):
            continue
        a = np.asarray(arr, np.float32)
        if not per_channel:
            a = np.asarray(a.max() if a.size else 0.0, np.float32)  # shape ()
        elif a.size and a.max() > 0:
            a = np.maximum(a, floor * a.max())
        # headroom folds into the VALUES here (not a trace-time constant in
        # QuantConv) so COSNET_INT8_HEADROOM sweeps reuse the compiled graph
        node = tree
        for part in path.split("/"):
            node = node.setdefault(part, {})
        node["amax"] = a * headroom
    return tree


def _quantize_weights(kernel, sx):
    """Per-output-channel weight quantization against an activation scale.

    Per-channel ``sx`` ([ci]): fold it into the kernel before quantizing —
    ``Σ_c (x_c/s_c)·(w_c·s_c)`` is exact, so the finer activation
    granularity costs nothing in the MAC or the rescale. Scalar ``sx``
    (per-tensor static, COSNET_INT8_PER_CHANNEL=0): quantize the kernel
    alone and carry ``sx`` in the output scale — skips the fold's extra
    weight passes (the round-4 form)."""
    sx = jnp.asarray(sx)
    if sx.ndim == 0 or sx.size == 1:
        w_scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0
        kq = jnp.clip(jnp.round(kernel * (1.0 / w_scale)), -127, 127).astype(jnp.int8)
        return kq, sx.reshape(()) * w_scale
    w_eff = kernel * sx[:, None]
    w_scale = jnp.maximum(jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)), 1e-12) / 127.0
    kq = jnp.clip(jnp.round(w_eff * (1.0 / w_scale)), -127, 127).astype(jnp.int8)
    return kq, w_scale  # activation scale already inside w_eff


class QuantizedActivation:
    """A tensor pre-quantized once for MULTIPLE consumer convs.

    ``xq`` int8 values, ``sx`` per-input-channel dequant scales
    (x ≈ xq·sx). Produced by :func:`shared_quantize`; consumed by
    :class:`QuantConv`, which skips its own activation quantize and folds
    ``sx`` into its weight quantization exactly as in the per-site path.
    """

    __slots__ = ("xq", "sx")

    def __init__(self, xq, sx):
        self.xq = xq
        self.sx = sx


def shared_quantize(mod: nn.Module, x, name: str = "amax"):
    """Quantize ``x`` ONCE under ``mod``'s scope for several consumer convs.

    Why: with per-site runtime scales, N convs reading the same activation
    each emit their own quantize chain — structurally distinct HLO (each
    reads a different scale variable), so XLA cannot CSE them. The compiled
    r5 graph wrote EIGHT s8[8,61,107,2048] copies of the ASPP input
    (~0.85 GB of redundant HBM writes per step, fused_computation.46 in
    the dumped HLO). One shared site -> one s8 tensor.

    Behavior by mode: static + calibrated -> returns
    :class:`QuantizedActivation`; dynamic (incl. the calibration trace) ->
    sows the per-channel range under ``mod``'s scope and returns ``x``
    unchanged (dynamic per-site chains are identical expressions of the
    same input, which XLA already CSEs); disabled/init/too-narrow -> ``x``.
    """
    ci = x.shape[-1]
    if not _INT8 or ci < _MIN_IN_CHANNELS or mod.is_initializing():
        return x
    x_f = x.astype(jnp.float32)
    if _STATIC and mod.has_variable("quant_scales", name):
        amax_c = mod.get_variable("quant_scales", name)  # headroom pre-folded
        sx = jnp.maximum(amax_c, 1e-12) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(x_f * (1.0 / sx)), -127, 127).astype(jnp.int8)
        return QuantizedActivation(xq, sx)
    amax_ch = jnp.max(jnp.abs(x_f), axis=tuple(range(x_f.ndim - 1)))
    mod.sow("quant_stats", name, amax_ch, reduce_fn=jnp.maximum,
            init_fn=lambda: jnp.zeros((ci,), jnp.float32))
    return x


class QuantConv(nn.Module):
    """Drop-in ``nn.Conv`` replacement running the MAC in int8.

    Same parameter names/shapes/dtypes as ``nn.Conv`` (f32 ``kernel``
    [kh, kw, ci, co], optional f32 ``bias``) so checkpoints are
    interchangeable between the f32/bf16 and int8 paths.
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    kernel_dilation: tuple = (1, 1)
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pre = isinstance(x, QuantizedActivation)  # shared_quantize output
        ci = (x.xq if pre else x).shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (*self.kernel_size, ci, self.features), jnp.float32)
        if not pre and ci < _MIN_IN_CHANNELS:
            # Narrow conv: quantize overhead outpaces the MXU win (see
            # enable_int8) — run the standard float path with the same params.
            dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=self.strides, padding=self.padding,
                rhs_dilation=self.kernel_dilation, dimension_numbers=dn)
            if self.use_bias:
                y = y + self.param("bias", self.bias_init, (self.features,),
                                   jnp.float32).astype(self.dtype)
            return y
        if pre:
            # Input quantized ONCE at the shared producer site; fold its
            # scales into the weight quantization (same math as below).
            xq = x.xq
            kq, out_scale = _quantize_weights(kernel, x.sx)
            dn = jax.lax.conv_dimension_numbers(xq.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
            acc = jax.lax.conv_general_dilated(
                xq, kq, window_strides=self.strides, padding=self.padding,
                rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * out_scale
            if self.use_bias:
                y = y + self.param("bias", self.bias_init, (self.features,), jnp.float32)
            return y.astype(self.dtype)
        x_f = x.astype(jnp.float32)
        amax_c = None
        if _STATIC and not self.is_initializing() \
                and self.has_variable("quant_scales", "amax"):
            amax_c = self.get_variable("quant_scales", "amax")
        if amax_c is not None:
            # Calibrated per-input-channel scales — trace-time constants
            # (const fast path) or read from the session's variable tree
            # (runtime input — recalibration never retraces).
            # The quantize below is pure elementwise, so XLA fuses it into
            # the producer's epilogue and this conv's input streams through
            # HBM as int8; the [ci] scales fold into the weight quantization
            # so the MAC/rescale are identical to the scalar form.
            sx = jnp.maximum(jnp.asarray(amax_c), 1e-12) * (1.0 / 127.0)  # headroom pre-folded
            # Multiply by the precomputed reciprocal, never divide (a
            # runtime-vector x/sx emits a true VPU divide per element).
            xq = jnp.clip(jnp.round(x_f * (1.0 / sx)), -127, 127).astype(jnp.int8)
            kq, out_scale = _quantize_weights(kernel, sx)
        else:
            # Dynamic per-tensor scale — one max-reduction over the input
            # per call. Sown per input channel so a calibration pass
            # (collect_amax) can harvest the observed ranges for the static
            # path; sow is a no-op unless quant_stats is mutable.
            amax_ch = jnp.max(jnp.abs(x_f), axis=tuple(range(x_f.ndim - 1)))
            amax_dyn = jnp.maximum(jnp.max(amax_ch), 1e-12)
            if not self.is_initializing():  # keep init param trees identical
                self.sow("quant_stats", "amax", amax_ch,
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.zeros((ci,), jnp.float32))
            x_scale = amax_dyn / 127.0
            xq = jnp.clip(jnp.round(x_f * (1.0 / x_scale)), -127, 127).astype(jnp.int8)
            # per-output-channel symmetric weight scale
            w_scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0
            kq = jnp.clip(jnp.round(kernel * (1.0 / w_scale)), -127, 127).astype(jnp.int8)
            out_scale = x_scale * w_scale
        dn = jax.lax.conv_dimension_numbers(x.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
        acc = jax.lax.conv_general_dilated(
            xq, kq, window_strides=self.strides, padding=self.padding,
            rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * out_scale
        if self.use_bias:
            y = y + self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return y.astype(self.dtype)
