"""int8 quantized inference path (v5e: 394 TOPS int8 vs 197 TFLOP/s bf16).

The eval step is ~87% MXU-bound convs already at bf16 peak
(docs/PERF_r2.md), so int8 is the remaining single-chip throughput lever.
Measured on this chip (benchmarks/int8_probe.py, two-length difference
timing): the ASPP 2048→512 atrous class runs 1.74× faster as s8×s8→s32,
layer3 3×3 2.61×, 1×1 1.51× — XLA does lower int8 ``conv_general_dilated``
onto the int8 MXU path.

Scheme: **dynamic symmetric quantization** — per-output-channel weight
scales (max|w|/127, computed from the f32 checkpoint weights at trace
time, folded into the rescale) and a per-tensor dynamic activation scale
(max|x|/127, one VPU reduction per conv). No calibration data needed, the
parameter tree is unchanged (same ``kernel``/``bias`` f32 params — any
checkpoint loads as-is), and accuracy is gated exactly like bf16 was:
uint8-scale mask agreement vs the f32 path
(tests/test_quant.py / the --quantize drive).

Like context parallelism, the switch is trace-time module state
(:func:`enable_int8`) rather than an attribute threaded through every
module: ``resnet._conv`` / ``aspp._biased_conv`` consult it when they
build, swapping ``nn.Conv`` for :class:`QuantConv` with identical
names/param shapes.

BN stays f32 downstream (it consumes the rescaled f32 conv output); the
co-attention kernel, classifiers, and mask decode are untouched — the
trunk/ASPP convs are where the int8 FLOPs are.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

_INT8 = False
_MIN_IN_CHANNELS = 0
_STATIC_AMAX: dict = {}  # conv site path -> calibrated activation max|x|


def enable_int8(min_in_channels: int = 0, static_amax: dict = None):
    """``min_in_channels``: quantize only convs at least this wide on the
    input-channel axis. Full-model measurement (docs/PERF_r3.md): blanket
    int8 wins just 7% — every conv input pays a quantize pass (an extra
    elementwise read+write), which on the narrow HBM-bound convs costs what
    the MXU saves. The wide convs (2048/1024-ch ASPP + layer3/4 entries)
    are where int8's 1.5-1.7x is net-positive, and the ASPP branches share
    one quantized input (XLA CSEs the identical quantize chains).

    ``static_amax`` (from :func:`collect_amax`): per-site CALIBRATED
    activation ranges. With a static scale the quantize is a pure
    elementwise chain — no max-reduction over the producer's output — so
    XLA fuses it into the producing conv/BN/ReLU epilogue and the
    activation crosses HBM as int8 (the "residual stream int8" form:
    requantization folded into the epilogues, the dynamic path's extra
    read+write per conv input gone). That removes the narrow-conv
    overhead, so ``min_in_channels`` can drop to cover the whole trunk."""
    global _INT8, _MIN_IN_CHANNELS, _STATIC_AMAX
    _INT8 = True
    _MIN_IN_CHANNELS = min_in_channels
    _STATIC_AMAX = dict(static_amax or {})


def disable_int8():
    global _INT8, _STATIC_AMAX
    _INT8 = False
    _STATIC_AMAX = {}


def int8_enabled() -> bool:
    return _INT8


def min_in_channels() -> int:
    return _MIN_IN_CHANNELS


def static_amax() -> dict:
    return _STATIC_AMAX


def amax_headroom() -> float:
    """Safety margin on calibrated ranges: activations on frames beyond the
    calibration batch may exceed its max|x|; values past the range clip to
    ±127 (symmetric clip — graceful, but headroom delays it). Gated end to
    end by the mask-agreement fingerprint drives."""
    import os

    return float(os.environ.get("COSNET_INT8_HEADROOM", "1.1"))


def collect_amax(model, variables, inputs: tuple, **apply_kwargs) -> dict:
    """One calibration forward: run the model with the ``quant_stats``
    collection mutable (dynamic-int8 mode must be enabled) and return
    ``{site_path: max|activation|}`` for every quantized conv input site.

    Feed it a REPRESENTATIVE batch (e.g. the eval loop's first preprocessed
    batch): the scales it yields are baked into the traced graph as
    constants by :func:`enable_int8`'s ``static_amax``."""
    import jax

    @jax.jit
    def run(v, *ins):
        _, stats = model.apply(v, *ins, mutable=["quant_stats"], **apply_kwargs)
        return stats["quant_stats"]

    stats = jax.device_get(run(variables, *inputs))
    flat = {}

    def walk(prefix, node):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(prefix + [k], v)
            elif k == "amax":
                flat["/".join(prefix)] = float(jnp.asarray(v).max())

    walk([], stats)
    return flat


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
        ci = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (*self.kernel_size, ci, self.features), jnp.float32)
        if ci < _MIN_IN_CHANNELS:
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
        # per-output-channel symmetric weight scale
        w_scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0
        kq = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
        x_f = x.astype(jnp.float32)
        site = "/".join(self.scope.path)
        amax = _STATIC_AMAX.get(site)
        if amax is not None:
            # Static calibrated scale: the quantize below is pure
            # elementwise, so XLA fuses it into the producer's epilogue and
            # this conv's input streams through HBM as int8.
            x_scale = max(amax, 1e-12) * amax_headroom() / 127.0
        else:
            # Dynamic per-tensor scale — one max-reduction over the input
            # per call. Sown so a calibration pass (collect_amax) can
            # harvest the observed range for the static path.
            amax_dyn = jnp.maximum(jnp.max(jnp.abs(x_f)), 1e-12)
            if not self.is_initializing():  # keep init param trees identical
                self.sow("quant_stats", "amax", amax_dyn,
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.zeros((), jnp.float32))
            x_scale = amax_dyn / 127.0
        xq = jnp.clip(jnp.round(x_f / x_scale), -127, 127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(x.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
        acc = jax.lax.conv_general_dilated(
            xq, kq, window_strides=self.strides, padding=self.padding,
            rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (x_scale * w_scale)
        if self.use_bias:
            y = y + self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return y.astype(self.dtype)
