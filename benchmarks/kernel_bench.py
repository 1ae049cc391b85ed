#!/usr/bin/env python
"""Micro-benchmark for the Pallas co-attention kernels on the real TPU.

Sweeps (block_q, block_k) for `flash_xattn_bidir` (and optionally the
unidirectional `flash_xattn` pair it replaced) at the flagship eval geometry
(480×854 → HW = 61·107 = 6527 tokens, C = 256, batch 8) so the default block
sizes in cosnet_tpu/ops/coattention_pallas.py are measured, not guessed.

Timing forces a host transfer per iteration (`float(jnp.sum(...))`) because
`block_until_ready` does not block on the axon relay (see
.claude/skills/verify/SKILL.md); the scalar-sum epilogue is the same for all
configs so the comparison is fair.

Usage:  python benchmarks/kernel_bench.py [--dtype bfloat16] [--iters 20]
"""
import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cosnet_tpu.ops.coattention_pallas import flash_xattn, flash_xattn_bidir  # noqa: E402


def time_call(fn, *args, iters: int) -> float:
    def reduced(*a):  # one scalar depending on EVERY output (nothing DCE-able)
        out = fn(*a)
        leaves = out if isinstance(out, tuple) else (out,)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    reduced_jit = jax.jit(reduced)
    float(reduced_jit(*args))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        s = float(reduced_jit(*args))
    assert np.isfinite(s)
    return (time.time() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=61 * 107, help="tokens per frame (480x854/os8)")
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--unidir", action="store_true", help="also sweep the two-pass flash_xattn pair")
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    shape = (args.batch, args.hw, args.channels)
    p, b, a = (jnp.asarray(rng.standard_normal(shape, dtype=np.float32), dtype=dtype) for _ in range(3))
    print(f"backend={jax.default_backend()} shape={shape} dtype={args.dtype}")

    flops = 3 * 2 * args.batch * args.hw * args.hw * args.channels  # bidir: 3 matmuls/tile
    results = []
    for bq, bk in itertools.product((256, 512, 1024), (128, 256, 512)):
        try:
            ms = time_call(
                lambda p, b, a: flash_xattn_bidir(p, b, a, block_q=bq, block_k=bk),
                p, b, a, iters=args.iters)
        except Exception as e:  # VMEM overflow at large products
            print(f"bidir bq={bq:5d} bk={bk:4d}: FAILED ({type(e).__name__})")
            continue
        results.append((ms, bq, bk))
        print(f"bidir bq={bq:5d} bk={bk:4d}: {ms:7.2f} ms  {flops / ms / 1e9:6.1f} TFLOP/s")
    if results:
        best = min(results)
        print(f"best bidir: block_q={best[1]} block_k={best[2]} at {best[0]:.2f} ms")

    if args.unidir:
        flops_u = 2 * 2 * 2 * args.batch * args.hw * args.hw * args.channels  # two passes
        for bq, bk in itertools.product((256, 512, 1024), (256, 512)):
            def two_pass(p, b, a, bq=bq, bk=bk):
                za = flash_xattn(p, b, b, block_q=bq, block_k=bk)
                zb = flash_xattn(b, p, a, block_q=bq, block_k=bk)
                return za, zb
            try:
                ms = time_call(two_pass, p, b, a, iters=args.iters)
            except Exception as e:
                print(f"2pass bq={bq:5d} bk={bk:4d}: FAILED ({type(e).__name__})")
                continue
            print(f"2pass bq={bq:5d} bk={bk:4d}: {ms:7.2f} ms  {flops_u / ms / 1e9:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
