"""Calibrate the serial cost of walk-loop constructs on the real TPU.

The packet walk is a while_loop whose body chains: scalar row load ->
vector math -> cross-lane any-reduce -> lax.cond branch.  If the chain's
LATENCY (not vector throughput) dominates, cutting vector ops per row buys
nothing — this microbench measures per-iteration cost vs (vector ops,
any-reduce, cond) to find the floor.

Usage: python tools/loop_cost.py [--iters 2000] [--rows 16] [--cols 256]
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
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n_iter, n_ops, use_reduce, use_cond, tile):
    def kernel(tab_ref, x_ref, o_ref):
        x0 = x_ref[...]

        def body(c):
            i, acc = c
            row = tab_ref[pl.ds(i % 64, 1), :]  # scalar-indexed row load
            v = acc
            for k in range(n_ops):
                # max(madd) chain: non-associative, so Mosaic cannot
                # collapse the scalar products into one folded madd
                v = jnp.maximum(v * row[0, k % 128] + 1.0e-7, v * 0.99995)
            if use_reduce:
                flag = jnp.any(v > acc)
                if use_cond:
                    v = jax.lax.cond(flag, lambda a: a * 0.9999, lambda a: a, v)
                else:
                    v = jnp.where(flag, v * 0.9999, v)
            return (i + 1, v)

        _, acc = jax.lax.while_loop(lambda c: c[0] < n_iter, body, (jnp.int32(0), x0))
        o_ref[...] = acc

    return kernel


def run(n_iter, n_ops, use_reduce, use_cond, tile):
    tab = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128) * 1e-6 + 1.0
    x = jnp.ones(tile, jnp.float32)
    fn = pl.pallas_call(
        make_kernel(n_iter, n_ops, use_reduce, use_cond, tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(tile, jnp.float32),
    )
    f = jax.jit(lambda t, x: fn(t, x))
    out = f(tab, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(5):
        # vary the input so the tunneled backend cannot replay a cached
        # result for an identical dispatch
        out = f(tab, x + jnp.float32(i) * 1e-6)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    ns = dt / n_iter * 1e9
    print(f"tile={tile} ops={n_ops:4d} reduce={int(use_reduce)} "
          f"cond={int(use_cond)}: {ns:8.1f} ns/iter  ({dt * 1e3:.2f} ms total)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4000)
    args = ap.parse_args()
    for tile in ((8, 256),):
        for ops, red, cond in ((0, False, False), (40, False, False),
                               (100, False, False), (320, False, False),
                               (40, True, False), (40, True, True),
                               (320, True, True)):
            run(args.iters, ops, red, cond, tile)


if __name__ == "__main__":
    main()
