#!/usr/bin/env python
"""Probe: is int8 conv (s8 x s8 -> s32) faster than bf16 on this v5e chip?

v5e peak is 394 TOPS int8 vs 197 TFLOP/s bf16. The eval step is ~87%
MXU-bound convs at bf16 peak (docs/PERF_r2.md), so int8 is the remaining
single-chip lever (VERDICT r2 #3) — IF XLA lowers ``conv_general_dilated``
with int8 operands onto the int8 MXU path rather than upcasting. This
measures the dominant conv geometries from the xplane profile.

Each timing jits a 16-iteration ``lax.fori_loop`` around the conv (data
dependence via the accumulator so iterations can't be CSE'd) and forces one
scalar D2H per call — the tunneled relay adds 3-29 ms/sync, so per-conv time
is (wall - sync)/iters.
"""
import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def conv_loop(x, k, iters, dilation, preferred):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))

    def body(_, acc):
        # Real data dependence on the previous iteration (a broadcast add of
        # one accumulator element) so XLA cannot CSE the loop into one conv.
        xi = x + acc[:, :1, :1, :1].astype(x.dtype)
        return lax.conv_general_dilated(
            xi, k, window_strides=(1, 1), padding="SAME",
            rhs_dilation=(dilation, dilation), dimension_numbers=dn,
            preferred_element_type=preferred)

    y0 = lax.conv_general_dilated(x, k, (1, 1), "SAME", rhs_dilation=(dilation, dilation),
                                  dimension_numbers=dn, preferred_element_type=preferred)
    return lax.fori_loop(0, iters, body, y0.astype(preferred))


def measure(name, shape_x, shape_k, dtype, preferred, dilation=1, reps=5):
    """Per-conv device time via the two-length difference (t_long − t_short)
    / (iters_long − iters_short): the relay's per-sync round-trip (3-150 ms
    depending on session load) and the dispatch constant cancel exactly."""
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 128, shape_x, dtype=np.int8))
        k = jnp.asarray(rng.integers(-127, 128, shape_k, dtype=np.int8))
    else:
        x = jnp.asarray(rng.standard_normal(shape_x), dtype)
        k = jnp.asarray(rng.standard_normal(shape_k), dtype)

    short_iters, long_iters = 8, 72
    times = {}
    for iters in (short_iters, long_iters):
        f = jax.jit(functools.partial(conv_loop, iters=iters, dilation=dilation, preferred=preferred))
        out = f(x, k)
        float(jnp.sum(out.astype(jnp.float32)[:1, :4, :4]))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = f(x, k)
            float(jnp.sum(out.astype(jnp.float32)[:1, :4, :4]))
            best = min(best, time.time() - t0)
        times[iters] = best
    per_conv_ms = (times[long_iters] - times[short_iters]) * 1e3 / (long_iters - short_iters)
    n, h, w, ci = shape_x
    kh, kw, _, co = shape_k
    tops = 2 * n * h * w * ci * co * kh * kw / (per_conv_ms * 1e-3) / 1e12
    print(f"{name:42s} {per_conv_ms:8.3f} ms/conv  {tops:7.1f} T(FL)OP/s")
    return per_conv_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    b = args.batch
    geoms = [
        # the 61 ms/step class: ASPP atrous 3x3 2048->512 at 61x107
        ("aspp 3x3 d6 2048->512", (b, 61, 107, 2048), (3, 3, 2048, 512), 6),
        # layer3 conv2 3x3 d2 256->256 (58/step)
        ("layer3 3x3 d2 256->256", (b, 61, 107, 256), (3, 3, 256, 256), 2),
        # layer3 conv1 1x1 1024->256
        ("layer3 1x1 1024->256", (b, 61, 107, 1024), (1, 1, 1024, 256), 1),
    ]
    for name, sx, sk, dil in geoms:
        t_bf = measure(f"bf16 {name}", sx, sk, jnp.bfloat16, jnp.float32, dil)
        t_i8 = measure(f"int8 {name}", sx, sk, jnp.int8, jnp.int32, dil)
        print(f"  -> int8/bf16 speedup: {t_bf / t_i8:.2f}x")


if __name__ == "__main__":
    main()
