"""Batched array-based MCTS (reference: self_play.py classes
WU_UCT / MCTS / WP_MCTS, lines 12-876)."""

from transgo_tpu.search.tree import Tree  # noqa: F401
from transgo_tpu.search.mcts import MCTS, SearchMode  # noqa: F401
