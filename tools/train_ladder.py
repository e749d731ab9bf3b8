"""Long training run producing an Elo checkpoint ladder (VERDICT r1 item 3).

Runs the full-config pipeline (210-sim WP-MCTS, 128-feature net, B=256,
continuous fused self-play, device replay, gating) and snapshots the policy
every ``--snap-every`` seconds as ``ladder_g{games:06d}_t{steps:07d}`` under
the results dir (games count + train steps: games alone collided when
wave-synced completions landed several snaps on one count), plus a rolling
full checkpoint for crash resume. Each snapshot is git-committed as it lands
(VERDICT r3 weak #2: round 3's Run A lost every checkpoint when the VM was
recycled — snapshots now persist off-VM the moment they exist; disable with
--no-commit). Afterwards rank the ladder with:

    python -m transgo_tpu.cli elo --checkpoints <results>/ladder_g* \
        --games 16 --sims 100

Usage: python tools/train_ladder.py --seconds 14400 --snap-every 900 \
           --results ./results_ladder --pretrain 1200
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/transgo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def git_commit_paths(paths, message):
    """Best-effort persistence of run artifacts into the repo. Never
    raises: a failed commit must not kill the training run.

    The commit is SCOPED to ``paths`` (``git commit -- <paths>``) so
    unrelated previously-staged changes never ride along in a rung commit,
    and a best-effort ``git push`` follows each commit so snapshots
    actually leave a recyclable VM when a remote exists (ADVICE r4: local
    commits alone are not durable; without a remote the commit is still
    the best available persistence and the push failure is non-fatal)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        subprocess.run(["git", "-C", repo, "add", "-f", *paths],
                       check=True, capture_output=True, timeout=120)
        r = subprocess.run(
            ["git", "-C", repo, "commit", "-m", message, "--quiet",
             "--", *paths],
            capture_output=True, timeout=120,
        )
        ok = r.returncode == 0
        if ok:
            has_remote = subprocess.run(
                ["git", "-C", repo, "remote"],
                capture_output=True, text=True, timeout=30,
            )
            if has_remote.returncode == 0 and has_remote.stdout.strip():
                p = subprocess.run(
                    ["git", "-C", repo, "push", "--quiet"],
                    capture_output=True, timeout=120,
                )
                if p.returncode != 0:  # pragma: no cover
                    print("[ladder] git push failed (non-fatal); commit "
                          "is local only", flush=True)
        return ok
    except Exception as e:  # pragma: no cover
        print(f"[ladder] git commit failed (non-fatal): {e}", flush=True)
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=14400)
    ap.add_argument("--snap-every", type=float, default=900)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--results", default="./results_ladder")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pretrain", type=float, default=0,
                    help="seconds of 7x7 scale-bound pretraining first; "
                    "the resulting sub_policy drives scale transfer "
                    "(the reference's full curriculum: scale_train_bound "
                    "-> transfer-assisted 9x9, configure.py:52/82-86)")
    ap.add_argument("--pretrain-batch", type=int, default=1024,
                    help="selfplay batch for the 7x7 pretrain. Default 1024: "
                    "the 7x7 fused chunk is a pathological ~38-min Mosaic "
                    "compile at B=256 but compiles in minutes at B=1024 "
                    "(probe data in RESULTS_r4.md)")
    ap.add_argument("--sub-model", default=None,
                    help="existing 7x7 sub_policy dir (skips --pretrain)")
    ap.add_argument("--evaluate-num", type=int, default=1500,
                    help="gate-arena cadence in ticks (reference "
                    "configure.py:46 uses 1500 driver ticks; lower it for "
                    "short runs so the +100-and-freeze gate dynamics are "
                    "exercised more than once)")
    ap.add_argument("--no-commit", action="store_true",
                    help="do not git-commit snapshots as they land")
    args = ap.parse_args()

    from transgo_tpu.config import Config
    from transgo_tpu.runtime.pipeline import TrainPipeline

    commit = not args.no_commit
    results_abs = os.path.abspath(args.results)

    sub_model = args.sub_model
    if args.pretrain > 0 and not sub_model:
        from transgo_tpu.curriculum import build_scale_bound_pipeline

        pre = build_scale_bound_pipeline(
            quiet=False,
            selfplay_batch=args.pretrain_batch,
            continuous_selfplay=True,
            evaluate_num=10**9,
            results_path=os.path.join(args.results, "pretrain"),
            seed=args.seed,
        )
        print(f"[ladder] 7x7 scale-bound pretrain for {args.pretrain:.0f}s "
              f"at B={args.pretrain_batch}", flush=True)
        pre.train(max_seconds=args.pretrain, log_every=200)
        pre.flush_pending()
        pre._save_policy(pre.learner.variables(pre.train_state),
                         "sub_policy")
        sub_model = os.path.join(results_abs, "pretrain", "sub_policy")
        print(f"[ladder] pretrain done: {pre.now_play_games} games, "
              f"{pre.now_train_steps} train steps -> {sub_model}",
              flush=True)
        del pre
        if commit:
            git_commit_paths(
                [sub_model],
                f"ladder: 7x7 pretrain sub_policy (B={args.pretrain_batch})",
            )

    cfg = Config(
        selfplay_batch=args.batch,
        continuous_selfplay=True,
        results_path=args.results,
        seed=args.seed,
        init_sub_model=sub_model,
        # arena gate cadence (reference: 1500 driver ticks, configure.py:46)
        evaluate_num=args.evaluate_num,
    )
    pipe = TrainPipeline(cfg)
    ckpt = os.path.join(results_abs, "resume_ckpt")
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
        name = (f"ladder_g{pipe.now_play_games:06d}"
                f"_t{pipe.now_train_steps:07d}")
        pipe._save_policy(pipe.learner.variables(pipe.train_state), name)
        pipe.save_checkpoint(ckpt)
        snap_i += 1
        print(f"[ladder] snap {snap_i}: {name} "
              f"(play={pipe.now_play_steps} train={pipe.now_train_steps} "
              f"lr={pipe.learn_rate:.2e} ratio={pipe.train_play_ratio:.3f} "
              f"gate_score={pipe.evaluate_score})",
              flush=True)
        if commit:
            # rung + live metrics/gate history off-VM immediately
            git_commit_paths(
                [
                    os.path.join(results_abs, name),
                    os.path.join(results_abs, "metrics.jsonl"),
                    os.path.join(results_abs, cfg.record_train),
                ],
                f"ladder: rung {name} (games={pipe.now_play_games} "
                f"train={pipe.now_train_steps} "
                f"gate_score={pipe.evaluate_score})",
            )
    print(f"[ladder] done: {pipe.now_play_games} games, "
          f"{pipe.now_train_steps} train steps, {snap_i} snapshots")


if __name__ == "__main__":
    main()
