"""A/B the per-group aggregation formulations on the real chip.

The label pass is ~free (0.04 ms); group_stats is now dominated by the
one-hot segment sum + read-back. Variants:
  matmul-bf16  one-hot bf16 MXU matmul (current production)
  matmul-int8  one-hot int8 MXU matmul (half the operand bytes)
  reduce       fused where+sum over [B, r, i, k] (no MXU, one VPU reduction)
Run on the TPU when it is free: python tools/bench_segsum.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/transgo_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def variants(n):
    iota = jnp.arange(n, dtype=jnp.int32)

    def mm_bf16(lbl, vals):
        oh = (lbl[:, None, :] == iota[None, :, None]).astype(jnp.bfloat16)
        return jnp.matmul(oh, vals.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def mm_int8(lbl, vals):
        oh = (lbl[:, None, :] == iota[None, :, None]).astype(jnp.int8)
        return jnp.matmul(oh, vals.astype(jnp.int8),
                          preferred_element_type=jnp.int32)

    def reduce(lbl, vals):
        oh = lbl[:, None, :] == iota[None, :, None]          # [B, r, i]
        return jnp.sum(
            jnp.where(oh[..., None], vals[:, None, :, :], 0), axis=2
        )

    return {"matmul-bf16": mm_bf16, "matmul-int8": mm_int8, "reduce": reduce}


def main():
    rng = np.random.default_rng(0)
    for size, b in ((9, 4096), (19, 1024)):
        n = size * size
        stones = rng.choice([0, 1, 2], size=(b, n), p=[.4, .3, .3])
        lbl = jnp.asarray(
            np.where(stones > 0, rng.integers(0, n, size=(b, n)), n),
            jnp.int32)
        vals = jnp.asarray(
            rng.integers(0, 4, size=(b, n, 2)).astype(np.int32))
        for name, fn in variants(n).items():
            f = jax.jit(fn)
            t0 = time.perf_counter()
            jax.block_until_ready(f(lbl, vals))
            ct = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(20):
                out = f(lbl, vals)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 20
            print(f"{size}x{size} b={b} {name}: compile {ct:.1f}s "
                  f"steady {dt * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
