"""transgo_tpu — a TPU-native (JAX/XLA/Pallas) AlphaZero-Go framework.

A ground-up re-design of the capabilities of Hjinhan/Transgo for TPU:

- ``ops``        pure-JAX vectorized Go engine (replaces GoEnv/go_env.so + ctypes
                 binding; reference: GoEnv/cpp_src/board.cc, go_env.cc)
- ``models``     Flax policy/value/ownership networks (reference: model.py)
- ``search``     batched array-based MCTS: classic PUCT + virtual loss, WU-UCT
                 incomplete updates, WP variance bonus (reference: self_play.py)
- ``runtime``    actor-learner loop, replay, ratio controller, gating,
                 checkpointing (reference: transgo.py, trainer.py,
                 replay_buffer.py, shared_storage.py)
- ``parallel``   mesh / shard_map scale-out (replaces the Ray actor soup)
- ``eval``       arena gating, MLE Elo, random-bot smoke tests (reference:
                 elo.py, test_trans.py)
- ``native``     C++ rules oracle for differential testing (native-component
                 parity with GoEnv/cpp_src)
- ``curriculum`` 7x7 scale-transfer pre-training recipes (reference:
                 scale_train/scale_train_bound, scale_train/scale_train_live)
- ``ui``         GTP front-end for human play (reference: human_play.py)
"""

__version__ = "0.1.0"

from transgo_tpu.config import Config  # noqa: F401
