"""Characterize the Mosaic fused-chunk compile time by shape (VERDICT r3
"next" item 2: the 7x7 scale-bound chunk compiled ~38 min at B=256 on a
cold cache, which kept the curriculum out of round 3's artifacted run).

Builds the scale-bound (7x7) or main (9x9) pipeline at a given batch size
and times: pipeline construction, the first run_tick (dominated by the
fused-chunk jit compile), and a warm tick. Prints one JSON line so sweeps
are machine-readable.

Usage: python tools/probe_compile.py --batch 1024 --recipe bound
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/transgo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--recipe", choices=["bound", "main"], default="bound")
    ap.add_argument("--chunk-ticks", type=int, default=0,
                    help="override selfplay_chunk_ticks (0 = default)")
    ap.add_argument("--ticks", type=int, default=3)
    args = ap.parse_args()

    import jax

    overrides = dict(
        selfplay_batch=args.batch,
        continuous_selfplay=True,
        evaluate_num=10**9,
        results_path="/tmp/probe_compile",
    )
    if args.chunk_ticks:
        overrides["selfplay_chunk_ticks"] = args.chunk_ticks

    t0 = time.time()
    if args.recipe == "bound":
        from transgo_tpu.curriculum import build_scale_bound_pipeline

        pipe = build_scale_bound_pipeline(quiet=True, **overrides)
    else:
        from transgo_tpu.config import Config
        from transgo_tpu.runtime.pipeline import TrainPipeline

        pipe = TrainPipeline(Config(**overrides), quiet=True)
    t_build = time.time() - t0

    t0 = time.time()
    pipe.run_tick()
    pipe.flush_pending()
    jax.block_until_ready(pipe.actor_state.move_count)
    t_first = time.time() - t0

    t0 = time.time()
    for _ in range(max(1, args.ticks - 1)):
        pipe.run_tick()
    pipe.flush_pending()
    jax.block_until_ready(pipe.actor_state.move_count)
    t_warm = (time.time() - t0) / max(1, args.ticks - 1)

    print(json.dumps({
        "recipe": args.recipe, "batch": args.batch,
        "chunk_ticks": pipe.config.selfplay_chunk_ticks,
        "build_s": round(t_build, 1),
        "first_tick_s": round(t_first, 1),
        "warm_tick_s": round(t_warm, 2),
        "moves": pipe.now_play_steps,
    }), flush=True)


if __name__ == "__main__":
    main()
