"""Capture a jax.profiler trace of one play_move at production config."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/transgo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

from transgo_tpu.config import Config
from transgo_tpu.models import build_network
from transgo_tpu.ops import GoEngine
from transgo_tpu.runtime.actor import SelfPlayActor
from transgo_tpu.search.mcts import MCTS, SearchMode


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/transgo_trace"
    cfg = Config(num_simulation=210, selfplay_batch=256, num_features=128)
    eng = GoEngine(9, 7.5, 120)
    net = build_network(cfg, "main")
    variables = net.init(jax.random.PRNGKey(0))
    mcts = MCTS(cfg, eng, SearchMode.WP)
    actor = SelfPlayActor(cfg, mcts, net)
    state = actor.init_state(variables, jax.random.PRNGKey(1))
    play = jax.jit(actor.play_move)
    state, o = play(state, variables)
    jax.block_until_ready(o.done)
    state, o = play(state, variables)
    jax.block_until_ready(o.done)
    with jax.profiler.trace(out):
        state, o = play(state, variables)
        jax.block_until_ready(o.done)
    print("trace written to", out)


if __name__ == "__main__":
    main()
