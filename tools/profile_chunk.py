"""Time the fused production chunk (SelfPlayActor.run_chunk) at a given
shape and boundary cadence: wall per chunk, ms per search round, moves/s and
sim-steps/s — the numbers behind the boundary-amortization design
(Config.selfplay_boundary_every) and the full-config B-scaling study
(VERDICT r4 item 1).

Usage: python tools/profile_chunk.py [--batch 256] [--k 4] [--chunk 16]
       [--sims 210] [--features 128] [--reps 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/transgo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=4,
                    help="selfplay_boundary_every (rounds per boundary)")
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--sims", type=int, default=210)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--warm", type=int, default=4)
    args = ap.parse_args()

    from transgo_tpu.config import Config
    from transgo_tpu.models import build_network
    from transgo_tpu.ops import GoEngine
    from transgo_tpu.runtime.actor import SelfPlayActor
    from transgo_tpu.runtime.device_replay import device_replay_init
    from transgo_tpu.search.mcts import MCTS, SearchMode

    cfg = Config(
        num_simulation=args.sims,
        selfplay_batch=args.batch,
        num_features=args.features,
        continuous_selfplay=True,
        selfplay_chunk_ticks=args.chunk,
        selfplay_boundary_every=args.k,
    )
    eng = GoEngine(cfg.board_size, cfg.komi, cfg.max_step)
    net = build_network(cfg, "main")
    variables = net.init(jax.random.PRNGKey(0))
    mcts = MCTS(cfg, eng, SearchMode.WP)
    actor = SelfPlayActor(cfg, mcts, net)
    dreplay = device_replay_init(
        200_000, cfg.board_size, cfg.encode_state_channels,
        actor.num_actions, actor.own_dim,
    )
    print(f"B={args.batch} k={actor.boundary_every} chunk={args.chunk} "
          f"sims={args.sims} feat={args.features}", flush=True)

    t0 = time.time()
    state = actor.init_state(variables, jax.random.PRNGKey(1))
    jax.block_until_ready(state.move_count)
    print(f"init_state (incl. stagger): {time.time() - t0:.1f}s", flush=True)

    chunk = jax.jit(actor.run_chunk, donate_argnums=(0, 1))
    t0 = time.time()
    state, dreplay, stats = chunk(state, dreplay, variables)
    jax.block_until_ready(stats["moves"])
    print(f"chunk compile+first: {time.time() - t0:.1f}s", flush=True)

    for _ in range(args.warm):
        state, dreplay, stats = chunk(state, dreplay, variables)
    jax.block_until_ready(stats["moves"])

    rounds_per_chunk = (args.chunk // actor.boundary_every) \
        * actor.boundary_every
    moves = games = 0
    t0 = time.perf_counter()
    for _ in range(args.reps):
        state, dreplay, stats = chunk(state, dreplay, variables)
        moves += int(np.asarray(stats["moves"]))
        games += int(np.asarray(stats["games"]))
    jax.block_until_ready(state.move_count)
    dt = time.perf_counter() - t0
    per_chunk = dt / args.reps
    mps = moves / dt
    print(f"chunk: {per_chunk * 1e3:8.1f} ms "
          f"({per_chunk / rounds_per_chunk * 1e3:6.2f} ms/round eq.)")
    print(f"selfplay only: {mps:8.1f} moves/s  "
          f"{mps * args.sims:9.0f} sim-steps/s  "
          f"({moves} moves, {games} games, {args.reps} chunks)")


if __name__ == "__main__":
    main()
