"""Microbenchmark MainNetwork building blocks against the chip roofline.

Each rep chains its output into the next input (the runtime memoizes
repeated identical calls, so unchained timing loops read ~0)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/transgo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chain(fn, x0, *rest, reps=20, warmup=5, name="", flops=None):
    """fn(x, *rest) -> x'   (same shape/dtype so reps chain)."""
    x = fn(x0, *rest)
    jax.block_until_ready(x)
    for _ in range(warmup):
        x = fn(x, *rest)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = fn(x, *rest)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / reps
    extra = f"  {flops / dt / 1e12:7.1f} TF/s" if flops else ""
    print(f"{name:34s} {dt * 1e3:9.3f} ms{extra}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--size", type=int, default=9)
    args = ap.parse_args()
    b, f, s = args.batch, args.features, args.size
    print(f"device={jax.devices()[0]}  B={b} F={f} S={s}")
    key = jax.random.PRNGKey(0)

    # --- matmul peak proxy (chained: a <- normalize(a @ b)) ---
    mm_a = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
    mm_b = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
    mm = jax.jit(lambda a, c: (a @ c) * jnp.bfloat16(1e-2))
    timeit_chain(mm, mm_a, mm_b, name="matmul 8k^3 bf16", flops=2 * 8192**3)

    # --- single conv3x3 (chained) ---
    x = jax.random.normal(key, (b, s, s, f), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, f, f), jnp.bfloat16) * 0.03
    conv = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    )
    cflops = b * s * s * 9 * f * f * 2
    timeit_chain(conv, x, w, name="conv3x3 single", flops=cflops)

    # --- 18 stacked convs ---
    def trunk(x, w):
        for _ in range(18):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            x = jnp.clip(x, -1, 1)
        return x

    timeit_chain(jax.jit(trunk), x, w, name="conv3x3 x18 + clip",
                 flops=18 * cflops)

    # --- batched attention einsum core (the SAGAN mixing) ---
    n = s * s
    q = jax.random.normal(key, (b, n, f // 4), jnp.bfloat16)
    v = jax.random.normal(key, (b, n, f), jnp.bfloat16)

    def attn_core(q, v):
        e = jnp.einsum("bif,bjf->bij", q, q)
        a = jax.nn.softmax(e.astype(jnp.float32), -1).astype(jnp.bfloat16)
        o = jnp.einsum("bjc,bji->bic", v, a)
        return q + o[..., : f // 4] * jnp.bfloat16(1e-2)

    aflops = b * (2 * n * n * (f // 4) + 2 * n * n * f)
    timeit_chain(jax.jit(attn_core), q, v, name="attention einsum core",
                 flops=aflops)

    # --- one SelfAttention block (chained on x) ---
    from transgo_tpu.models.nets import SelfAttention

    attn = SelfAttention(4, True, jnp.bfloat16)
    xf = x.astype(jnp.float32)
    av = attn.init(key, xf, train=False)
    attn_j = jax.jit(
        lambda x, v: attn.apply(v, x, train=False).astype(jnp.float32)
        * 0.5
    )
    timeit_chain(attn_j, xf, av, name="SelfAttention block")

    # --- full MainNetwork (chain via obs perturbation from outputs) ---
    from transgo_tpu.models.nets import MainNetwork

    net = MainNetwork(s, f, jnp.bfloat16)
    obs = jax.random.normal(key, (b, s, s, 10), jnp.float32)
    nv = net.init(key, obs, train=False)

    def full(obs, nv):
        lp, val, own = net.apply(nv, obs, train=False)
        return obs + 1e-3 * own.reshape(b, s, s, 1)

    timeit_chain(jax.jit(full), obs, nv, name="MainNetwork full", reps=10)


if __name__ == "__main__":
    main()
