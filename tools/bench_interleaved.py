"""Measure production interleaved throughput: full-config continuous
self-play (210-sim WP-MCTS, 128-feature net, B=256) with 2048-sample train
steps caught up to the ratio target, overlapped vs synchronous dispatch.

The overlapped tick (TrainPipeline._run_tick_overlapped) dispatches the
train burst and the next self-play chunk before reading the previous
chunk's stats, hiding the ~30 ms tunnel readback and host control behind
device work.

Usage:  python tools/bench_interleaved.py [--batch 256] [--warm 90]
        [--measure 120] [--ratio 0.26] [--mode both|overlap|sync]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/transgo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def run(overlap: bool, args) -> float:
    from transgo_tpu.config import Config
    from transgo_tpu.runtime.pipeline import TrainPipeline

    cfg = Config(
        selfplay_batch=args.batch,
        continuous_selfplay=True,
        overlap_train_selfplay=overlap,
        train_play_ratio=args.ratio,
        adjust_train_play_ratio=False,
        evaluate_num=10**9,
        results_path="/tmp/bench_interleaved",
    )
    pipe = TrainPipeline(cfg, quiet=True)
    # warm up: compile, then keep going until games finish AND training
    # engages (a game takes ~max_step * batch / moves-per-s wall seconds —
    # far longer than the compile), with args.warm as the minimum and
    # 10*warm the bail-out
    t0 = time.time()
    while time.time() - t0 < args.warm or (
        pipe.now_train_steps == 0 and time.time() - t0 < 10 * args.warm
    ):
        pipe.run_tick()
    pipe.flush_pending()
    if pipe.now_train_steps == 0:
        print(f"[warn] training never engaged during warmup "
              f"({pipe.now_play_games} games)")
    # cancel the cold-start debt: the ratio controller is cumulative
    # (now_train/now_play < ratio) and training is blocked until the first
    # game finishes, so the warmup moves owe ratio*moves train steps —
    # left in place, the measure window times that catch-up burst instead
    # of the steady state. Rebase the play counter so the controller sits
    # exactly at target, then warm the steady-state interleave itself.
    pipe.now_play_steps = min(
        pipe.now_play_steps, int(pipe.now_train_steps / args.ratio)
    )
    t_ss = time.time()
    while time.time() - t_ss < 30:
        pipe.run_tick()
    pipe.flush_pending()
    games0 = pipe.now_play_games
    # measure
    m0_play, m0_train = pipe.now_play_steps, pipe.now_train_steps
    t1 = time.time()
    while time.time() - t1 < args.measure:
        pipe.run_tick()
    pipe.flush_pending()
    dt = time.time() - t1
    moves = pipe.now_play_steps - m0_play
    trains = pipe.now_train_steps - m0_train
    mps = moves / dt
    label = "overlap" if overlap else "sync"
    print(
        f"{label:8s} {mps:8.1f} moves/s  ({moves} moves, {trains} train "
        f"steps, ratio {trains / max(1, moves):.3f}, {dt:.0f}s, "
        f"games warm={games0} end={pipe.now_play_games})"
    )
    return mps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--warm", type=float, default=90.0)
    ap.add_argument("--measure", type=float, default=120.0)
    ap.add_argument("--ratio", type=float, default=0.26)
    ap.add_argument("--mode", default="both",
                    choices=["both", "overlap", "sync"])
    args = ap.parse_args()

    results = {}
    if args.mode in ("both", "sync"):
        results["sync"] = run(False, args)
    if args.mode in ("both", "overlap"):
        results["overlap"] = run(True, args)
    if len(results) == 2:
        print(f"overlap speedup: {results['overlap'] / results['sync']:.3f}x")


if __name__ == "__main__":
    main()
