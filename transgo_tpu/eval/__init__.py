"""Evaluation: batched arena gating, MLE Elo, random-bot smoke matches
(reference: self_play.py:986-1040, elo.py, test_trans.py)."""

from transgo_tpu.eval.arena import Arena  # noqa: F401
from transgo_tpu.eval.elo import calculate_ratings, elo_from_ratings  # noqa: F401
