"""VPU throughput micro-probe: f32 vs bf16 elementwise, and op costs.

Answers two design questions for the marchers with measurements instead
of folklore:
  1. Does bf16 elementwise arithmetic run faster than f32 in a Pallas
     TPU kernel (i.e. would a reduced-precision occlusion march pay)?
  2. Relative cost of the op classes a distance eval is made of
     (fma, min/max/select, sqrt, rsqrt, cos/atan2) at march intensity.

Method: one pallas_call per variant, (ROWS, 256) tile resident in VMEM,
fori_loop of K iterations each applying the op mix N times; device time
from the chained-call slope (same methodology as tools/profile_slope.py —
the ~25 ms dispatch floor cancels in the difference).

Usage: python tools/profile_vpu.py [--iters 2000] [--reps 64]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


ROWS = 256


def make_kernel(op: str, iters: int, dtype):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        one = jnp.asarray(1.0000001, dtype)
        half = jnp.asarray(0.5, dtype)

        def body(i, v):
            if op == "fma":
                # 8 true fmas: both operands vary, so the chain cannot be
                # constant-folded into one affine map (a*x+b composition).
                a = v * v + half
                b = v * a + one
                a = a * b + half
                b = b * a + one
                a = a * b + half
                b = b * a + one
                a = a * b + half
                b = b * a + one
                return a * half + b * half
            if op == "minmax":
                a = jnp.maximum(v, half)
                b = jnp.minimum(v, one)
                c = jnp.where(a > b, a * half, b)
                a = jnp.maximum(c, half)
                b = jnp.minimum(c, one)
                return jnp.where(a > b, a * half, b) * one
            if op == "sqrt":
                return jnp.sqrt(v * v + one)
            if op == "rsqrt":
                return jax.lax.rsqrt(v * v + one)
            if op == "cos":
                return jnp.cos(v) + half
            raise ValueError(op)

        o_ref[:] = jax.lax.fori_loop(0, iters, body, x)

    return kernel


def slope_time(fn, x, reps):
    # One program chaining `reps` dependent calls; slope = marginal cost.
    @jax.jit
    def chained(x):
        def body(i, v):
            return fn(v)
        return jax.lax.fori_loop(0, reps, body, x)

    # float(sum) forces completion through the remote tunnel —
    # block_until_ready does not synchronize on the axon plugin (DEVNOTES).
    def sync(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    sync(chained(x))
    t0 = time.perf_counter()
    sync(chained(x))
    t1 = time.perf_counter()

    @jax.jit
    def single(x):
        return fn(x)

    sync(single(x))
    t2 = time.perf_counter()
    sync(single(x))
    t3 = time.perf_counter()
    return ((t1 - t0) - (t3 - t2)) / (reps - 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--reps", type=int, default=64)
    args = p.parse_args()

    results = {}
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.full((ROWS, 256), 1.2345, dtype)
        for op in ("fma", "minmax", "sqrt", "rsqrt", "cos"):
            kern = make_kernel(op, args.iters, dtype)
            fn = lambda v, k=kern: pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype)
            )(v)
            try:
                dt = slope_time(fn, x, args.reps)
            except Exception as e:  # e.g. bf16 cmpf unsupported by target
                print(f"{op:8s} {name}: UNSUPPORTED "
                      f"({type(e).__name__}: {str(e).splitlines()[-1][:90]})",
                      flush=True)
                continue
            # ns per (lane-iteration): time / (iters * elements)
            per = dt / (args.iters * x.size) * 1e9
            results[f"{op}_{name}"] = per
            print(f"{op:8s} {name}: {dt*1e3:8.3f} ms/call  "
                  f"{per:8.4f} ns/elem-iter", flush=True)
    # Ratio summary
    for op in ("fma", "minmax", "sqrt", "rsqrt", "cos"):
        f = results.get(f"{op}_f32")
        b = results.get(f"{op}_bf16")
        if f and b:
            print(f"{op:8s} bf16/f32 = {b / f:.3f}")


if __name__ == "__main__":
    main()
