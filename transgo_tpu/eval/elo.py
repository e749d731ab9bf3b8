"""Maximum-likelihood Bradley-Terry Elo ratings.

Re-implements the reference's Elo tool (/root/reference/elo.py:32-71): MLE
ratings over a pool of agents from pairwise game results, agent 0 anchored,
reported as ``400 * log10(rating)``. Instead of scipy L-BFGS on the NLL
(elo.py:62-66), ratings are fit with the standard Bradley-Terry
minorization-maximization updates — dependency-free and provably convergent
to the same maximum likelihood.
"""

from __future__ import annotations

import numpy as np


def calculate_ratings(wins: np.ndarray, iters: int = 2000,
                      tol: float = 1e-10) -> np.ndarray:
    """MLE Bradley-Terry ratings.

    Args:
      wins: [K, K] matrix; wins[i, j] = games i won against j.

    Returns:
      ratings r (K,) normalized so r[0] == 1 (reference anchors agent 0,
      elo.py:56-60).
    """
    wins = np.asarray(wins, np.float64)
    k = wins.shape[0]
    games = wins + wins.T
    w = wins.sum(axis=1)
    r = np.ones(k)
    for _ in range(iters):
        denom = (games / (r[:, None] + r[None, :] + 1e-300)).sum(axis=1)
        new = np.where(denom > 0, (w + 1e-12) / (denom + 1e-12), r)
        new = new / new[0]
        if np.max(np.abs(new - r)) < tol:
            r = new
            break
        r = new
    return r


def elo_from_ratings(ratings: np.ndarray) -> np.ndarray:
    """elo = 400 * log10(r) (elo.py:69-71)."""
    return 400.0 * np.log10(np.maximum(ratings, 1e-300))


def rate_pool(wins: np.ndarray) -> np.ndarray:
    """Convenience: wins matrix -> Elo array anchored at agent 0 = 0."""
    return elo_from_ratings(calculate_ratings(wins))
