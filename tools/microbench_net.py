"""Trustworthy roofline microbench: iterate INSIDE one jitted call and
force a host readback to end the timing bracket.

Two failure modes of naive timing through the tunneled device runtime,
both measured here on 2026-08-18:
  1. repeated identical (function, inputs) dispatches are memoized;
  2. ``jax.block_until_ready`` does NOT actually block — a chained
     host-level timing loop reported a 42 PF/s matmul on a ~200 TF/s
     chip. Only a host readback (``float(scalar)`` / device_get) fences.
So: each measurement jits one function that runs the op `reps` times in a
lax.fori_loop with a chained carry and returns a scalar reduction; the
timed call takes a fresh seed argument (defeats memoization) and ends
with float() on the result. A fixed tunnel RTT of ~26-30 ms rides on
every call — it is measured empty and subtracted, and each figure is the
min over several timed calls.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/transgo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp


def measure_rtt(trials: int = 5) -> float:
    """Fenced-readback cost of an empty jitted call (the tunnel RTT)."""

    @jax.jit
    def nop(seed):
        return seed * 0 + jnp.float32(1)

    float(nop(jnp.float32(0)))  # compile
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        float(nop(jnp.float32(t + 1)))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit_injit(step, x0, *rest, reps=200, name="", flops=None,
                 rtt=0.0, trials=3):
    """step(x, *rest) -> x' with x' the same shape/dtype as x.

    Reports min-over-``trials`` of (call time - rtt) / reps; the varying
    seed defeats dispatch memoization between trials."""

    @jax.jit
    def run(x, seed, *rest):
        x = x + (seed * 0).astype(x.dtype)
        out = jax.lax.fori_loop(0, reps, lambda i, c: step(c, *rest), x)
        return jnp.float32(jnp.sum(out))

    float(run(x0, jnp.float32(0), *rest))  # compile + warm
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        float(run(x0, jnp.float32(99 + t), *rest))
        best = min(best, time.perf_counter() - t0)
    dt = max(best - rtt, 1e-12) / reps
    extra = f"  {flops / dt / 1e12:7.1f} TF/s" if flops else ""
    print(f"{name:34s} {dt * 1e3:9.3f} ms{extra}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--size", type=int, default=9)
    ap.add_argument("--reps", type=int, default=200)
    args = ap.parse_args()
    b, f, s, reps = args.batch, args.features, args.size, args.reps
    rtt = measure_rtt()
    print(f"device={jax.devices()[0]}  B={b} F={f} S={s}  "
          f"rtt={rtt * 1e3:.1f} ms (subtracted)")
    key = jax.random.PRNGKey(0)

    # matmul peak proxy
    mm_a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    mm_b = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    timeit_injit(lambda a, c: ((a @ c) * jnp.bfloat16(1e-2)), mm_a, mm_b,
                 reps=reps, name="matmul 4k^3 bf16", flops=2 * 4096**3,
                 rtt=rtt)

    # single conv3x3 f->f at sxs
    x = jax.random.normal(key, (b, s, s, f), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, f, f), jnp.bfloat16) * 0.03
    cflops = b * s * s * 9 * f * f * 2

    def conv(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.clip(y, -1, 1).astype(jnp.bfloat16)

    timeit_injit(conv, x, w, reps=reps, name="conv3x3 + clip", flops=cflops,
                 rtt=rtt)

    # conv as explicit im2col matmul (what we'd hand-write in pallas).
    # conv_general_dilated_patches orders the patch feature dim (c, h, w)
    # with channel slowest, so the kernel must be transposed HWIO ->
    # IHW(O) before flattening to match the contraction (verified
    # numerically below; the naive w.reshape(9f, f) contracts mismatched
    # indices and is ~0.5 max-abs wrong).
    def conv_im2col(x, w):
        patches = jax.lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        wmat = w.transpose(2, 0, 1, 3).reshape(9 * f, f)
        y = patches.reshape(b * s * s, 9 * f) @ wmat
        return jnp.clip(y.reshape(b, s, s, f), -1, 1).astype(jnp.bfloat16)

    err = float(jnp.max(jnp.abs(
        conv(x, w).astype(jnp.float32) - conv_im2col(x, w).astype(jnp.float32)
    )))
    assert err < 0.1, f"im2col layout mismatch: max err {err}"
    timeit_injit(conv_im2col, x, w, reps=reps, name="conv3x3 im2col matmul",
                 flops=cflops, rtt=rtt)

    # full MainNetwork forward
    from transgo_tpu.config import Config
    from transgo_tpu.models import build_network

    cfg = Config(board_size=s, num_features=f)
    net = build_network(cfg, "main")
    variables = net.init(jax.random.PRNGKey(0))
    obs = jax.random.uniform(key, (b, s, s, cfg.encode_state_channels))

    def fwd(o, variables):
        log_p, v, own = net.apply(variables, o, train=False)
        upd = (jnp.exp(log_p[:, :-1]).reshape(b, s, s, 1) +
               own.reshape(b, s, s, 1) * 0.001)
        return (o + upd * 1e-6).astype(o.dtype)

    # 3x3-conv FLOPs in f->f equivalents: 18 trunk convs (9 res blocks x 2)
    # plus the 10->f stem and the 2/4-channel head convs at their true
    # widths; the 4 attention blocks' 1x1 convs and the dense heads are
    # uncounted (~5% more), so the printed TF/s is a slight underestimate.
    nconv_eff = 18 + (cfg.encode_state_channels + 2 + 4) / f
    nflops = b * (s * s * 9 * f * f * 2) * nconv_eff
    timeit_injit(fwd, obs, variables, reps=max(20, reps // 4),
                 name="MainNetwork fwd", flops=nflops, rtt=rtt)


if __name__ == "__main__":
    main()
