"""Long training run producing an Elo checkpoint ladder (VERDICT r1 item 3).

Runs the full-config pipeline (210-sim WP-MCTS, 128-feature net, B=256,
continuous fused self-play, device replay, gating) and snapshots the policy
every ``--snap-every`` seconds as ``ladder_g{games:06d}`` under the results
dir, plus a rolling full checkpoint for crash resume. Afterwards rank the
ladder with:

    python -m transgo_tpu.cli elo --checkpoints <results>/ladder_g* \
        --games 8 --sims 50

Usage: python tools/train_ladder.py --seconds 14400 --snap-every 900 \
           --results ./results_ladder
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/transgo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=14400)
    ap.add_argument("--snap-every", type=float, default=900)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--results", default="./results_ladder")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from transgo_tpu.config import Config
    from transgo_tpu.runtime.pipeline import TrainPipeline

    cfg = Config(
        selfplay_batch=args.batch,
        continuous_selfplay=True,
        results_path=args.results,
        seed=args.seed,
        # arena gate every ~1500 ticks as the reference (configure.py:46)
        evaluate_num=1500,
    )
    pipe = TrainPipeline(cfg)
    ckpt = os.path.join(os.path.abspath(args.results), "resume_ckpt")
    if args.resume:
        pipe.load_checkpoint(args.resume)
        print(f"resumed: games={pipe.now_play_games} "
              f"train={pipe.now_train_steps}")

    t0 = time.time()
    snap_i = 0
    while time.time() - t0 < args.seconds:
        budget = min(args.snap_every, args.seconds - (time.time() - t0))
        if budget <= 0:
            break
        pipe.train(max_seconds=budget, log_every=100)
        pipe.flush_pending()
        name = f"ladder_g{pipe.now_play_games:06d}"
        pipe._save_policy(pipe.learner.variables(pipe.train_state), name)
        pipe.save_checkpoint(ckpt)
        snap_i += 1
        print(f"[ladder] snap {snap_i}: {name} "
              f"(play={pipe.now_play_steps} train={pipe.now_train_steps} "
              f"lr={pipe.learn_rate:.2e} ratio={pipe.train_play_ratio:.3f} "
              f"gate_score={pipe.evaluate_score})",
              flush=True)
    print(f"[ladder] done: {pipe.now_play_games} games, "
          f"{pipe.now_train_steps} train steps, {snap_i} snapshots")


if __name__ == "__main__":
    main()
