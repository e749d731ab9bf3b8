"""Phase profiler for the self-play hot path at a given config.

Times, on the current default device:
  - net eval alone at the round's L*B leaf batch
  - one search round (descents + batched leaf analysis + eval + completions)
  - full search (visit-target loop)
  - promote_subtree (tree reuse) alone
  - full play_move

Usage: python tools/profile_selfplay.py [--batch 256] [--sims 210]
       [--features 128] [--readouts 4]
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


def timeit(fn, *args, reps=10, warmup=3, name=""):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--sims", type=int, default=210)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--readouts", type=int, default=4)
    ap.add_argument("--size", type=int, default=9)
    args = ap.parse_args()

    from transgo_tpu.config import Config
    from transgo_tpu.models import build_network
    from transgo_tpu.ops import GoEngine
    from transgo_tpu.runtime.actor import SelfPlayActor
    from transgo_tpu.search.mcts import MCTS, SearchMode
    from transgo_tpu.search.tree import promote_subtree

    cfg = Config(
        board_size=args.size,
        max_step=args.size * args.size + 39,
        num_simulation=args.sims,
        selfplay_batch=args.batch,
        num_features=args.features,
        parallel_readouts=args.readouts,
    )
    eng = GoEngine(cfg.board_size, cfg.komi, cfg.max_step)
    net = build_network(cfg, "main")
    variables = net.init(jax.random.PRNGKey(0))
    mcts = MCTS(cfg, eng, SearchMode.WP)
    actor = SelfPlayActor(cfg, mcts, net)
    state = actor.init_state(variables, jax.random.PRNGKey(1))
    b, m, a = args.batch, cfg.max_nodes, eng.spec.num_actions
    print(f"B={b} M={m} A={a} sims={args.sims} L={args.readouts} "
          f"feat={args.features}")

    # --- net eval at L*B ---
    ef = actor._eval_fn(variables)
    obs = jnp.zeros(
        (args.readouts * b, args.size, args.size, cfg.encode_state_channels),
        jnp.float32,
    )
    tp = jnp.zeros((args.readouts * b,), jnp.int8)
    net_j = jax.jit(ef)
    timeit(net_j, obs, tp, name=f"net eval [{args.readouts * b}]")

    # --- tree phases ---
    tree = mcts.new_tree(b)
    tree = jax.jit(lambda t: mcts.reset_root(t, ef))(tree)
    key = jax.random.PRNGKey(2)
    active = jnp.ones((b,), bool)

    round_j = jax.jit(lambda t, k: mcts.run_round(t, ef, k, active))
    timeit(round_j, tree, key, name="run_round")

    search_j = jax.jit(lambda t, k: mcts.search(t, ef, k))
    full = timeit(search_j, tree, key, reps=3, warmup=1, name="search (full)")

    tree2 = search_j(tree, key)
    act = jnp.zeros((b,), jnp.int32)
    prom_j = jax.jit(promote_subtree)
    timeit(prom_j, tree2, act, name="promote_subtree")

    play = jax.jit(actor.play_move)
    state2, out = play(state, variables)
    jax.block_until_ready(out.done)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        state2, out = play(state2, variables)
    jax.block_until_ready(out.done)
    dt = (time.perf_counter() - t0) / reps
    print(f"{'play_move':28s} {dt * 1e3:9.2f} ms  "
          f"-> {b / dt:.0f} moves/s, {b * args.sims / dt:.0f} sims/s")
    print(f"search/play ratio: {full / dt:.2f}")


if __name__ == "__main__":
    main()
