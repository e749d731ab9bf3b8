"""Quantify depth-cap bias at the production 9x9 config (VERDICT r3 "next"
item 6): run the fused continuous chunk at different ``search_max_depth``
bounds from a TRAINED checkpoint (a peaked policy reuses deep subtrees —
a fresh net underestimates capping) and report the capped-descent rate and
the throughput cost of a looser bound. One JSON line per run.

Usage:
    python tools/probe_depth.py --depth 64 --init results_ladder/ladder_g000432
    python tools/probe_depth.py --depth 96 --init results_ladder/ladder_g000432
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
    ap.add_argument("--depth", type=int, default=64)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--init", default=None,
                    help="policy dir used for BOTH play and the frozen "
                    "gate (realistic reused-subtree depths)")
    ap.add_argument("--seconds", type=float, default=240)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from transgo_tpu.config import Config
    from transgo_tpu.runtime.pipeline import TrainPipeline

    cfg = Config(
        selfplay_batch=args.batch,
        continuous_selfplay=True,
        search_max_depth=args.depth,
        init_model=args.init,
        evaluate_num=10**9,
        results_path="/tmp/probe_depth",
        seed=args.seed,
    )
    pipe = TrainPipeline(cfg, quiet=True)

    t0 = time.time()
    pipe.run_tick()           # compile happens here
    pipe.flush_pending()
    t_compile = time.time() - t0

    base_ticks = pipe.tick
    base_moves = pipe.now_play_steps
    base_capped = pipe._depth_capped_total
    t0 = time.time()
    pipe.train(max_seconds=args.seconds, log_every=10**9)
    dt = time.time() - t0
    ticks = pipe.tick - base_ticks
    descents = (
        ticks * cfg.selfplay_chunk_ticks * cfg.selfplay_batch
        * cfg.parallel_readouts
    )
    capped = pipe._depth_capped_total - base_capped
    print(json.dumps({
        "depth": args.depth, "batch": args.batch,
        "init": bool(args.init),
        "compile_s": round(t_compile, 1),
        "measure_s": round(dt, 1),
        "moves_per_s": round((pipe.now_play_steps - base_moves) / dt, 1),
        "train_steps": pipe.now_train_steps,
        "capped": int(capped),
        "capped_rate": round(capped / max(1, descents), 5),
    }), flush=True)


if __name__ == "__main__":
    main()
