"""Board constants, static topology tables, and the batched board state.

TPU-native counterpart of the reference's C++ structs:

- constants mirror /root/reference/GoEnv/cpp_src/go_comm.h:20-79
  (PASS/RESIGN/INVALID codes, colors, neighbor/diagonal deltas);
- :class:`GoState` replaces the ``Board`` struct
  (/root/reference/GoEnv/cpp_src/board.h:27-58) — but where the reference
  stores an incrementally-maintained linked-list block decomposition
  (``Info``/``Block``, board.h:9-23), we store only the stone grid plus move
  history and recompute connectivity as a batched label-propagation whenever
  needed. On TPU that recomputation is a handful of fused gathers over the
  whole batch, far cheaper than divergent per-board pointer chasing;
- :class:`BoardSpec` precomputes the neighbor/diagonal tables that the
  reference expressed as the ``FOR_NEAR_4`` / ``FOR_DIAG_4`` macros
  (go_comm.h:65-76).

All state arrays carry a leading batch dimension ``B``: one program steps
thousands of games in lockstep.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from flax import struct

# Colors (go_comm.h:35-38)
EMPTY = 0
BLACK = 1
WHITE = 2
WALL = 3

# Special actions (go_comm.h:25-27)
PASS = -1
RESIGN = -2
INVALID = -3


def opponent(player):
    """OPPONENT macro (go_comm.h:79)."""
    return BLACK + WHITE - player


class BoardSpec:
    """Static per-board-size topology tables (python-level constants).

    Board size is a static Python int: 5/7/9/19 variants are separate jit
    specializations of the same source — this single class replaces the
    reference's three hand-synced C++ builds (root 9x9, scale_train_bound 7x7,
    scale_train_live 9x9; SURVEY.md section 2.1).
    """

    def __init__(self, size: int):
        self.size = size
        self.num_points = n = size * size
        self.num_actions = n + 1  # + pass
        self.pass_action = n

        coords = np.arange(n)
        x, y = coords % size, coords // size

        # 4-neighborhood (go_comm.h:43-44), sentinel index == n for off-board
        deltas = [(-1, 0), (0, -1), (1, 0), (0, 1)]
        nbr = np.full((n, 4), n, dtype=np.int32)
        nbr_ok = np.zeros((n, 4), dtype=bool)
        for i, (dx, dy) in enumerate(deltas):
            nx, ny = x + dx, y + dy
            ok = (0 <= nx) & (nx < size) & (0 <= ny) & (ny < size)
            nbr[ok, i] = (ny * size + nx)[ok]
            nbr_ok[:, i] = ok

        # diagonals (go_comm.h:48-49)
        diags = [(-1, -1), (-1, 1), (1, 1), (1, -1)]
        diag = np.full((n, 4), n, dtype=np.int32)
        diag_ok = np.zeros((n, 4), dtype=bool)
        for i, (dx, dy) in enumerate(diags):
            nx, ny = x + dx, y + dy
            ok = (0 <= nx) & (nx < size) & (0 <= ny) & (ny < size)
            diag[ok, i] = (ny * size + nx)[ok]
            diag_ok[:, i] = ok

        self.NBR = jnp.asarray(nbr)          # [n,4] neighbor coord or n
        self.NBR_OK = jnp.asarray(nbr_ok)    # [n,4] on-board mask
        self.DIAG = jnp.asarray(diag)
        self.DIAG_OK = jnp.asarray(diag_ok)
        self.NUM_NBRS = jnp.asarray(nbr_ok.sum(1).astype(np.int32))  # [n]

        # dense adjacency for the MXU connectivity path: ADJ[i, j] = 1 iff
        # j is a 4-neighbor of i. Board connectivity then becomes batched
        # n x n matmuls (boolean reachability by repeated squaring), which
        # the systolic array executes orders of magnitude faster than
        # per-point gather loops.
        adj = np.zeros((n, n), dtype=np.float32)
        for c in range(n):
            for d in range(4):
                if nbr_ok[c, d]:
                    adj[c, nbr[c, d]] = 1.0
        self.ADJ = jnp.asarray(adj)                       # [n, n] float32
        # number of squarings covering any in-board path: reach doubles per
        # squaring and starts at 1 hop
        self.REACH_ROUNDS = max(1, int(np.ceil(np.log2(max(2, n - 1)))))

    def __repr__(self):  # pragma: no cover
        return f"BoardSpec(size={self.size})"


@functools.lru_cache(maxsize=None)
def board_spec(size: int) -> BoardSpec:
    return BoardSpec(size)


@struct.dataclass
class GoState:
    """Batched Go game state (struct of arrays, leading dim B).

    Field-for-field coverage of the reference ``Board`` struct
    (board.h:27-58) minus the derived block decomposition:

    =============  ======================================================
    stones         ``infos[c].color`` grid          int8[B, n]
    next_player    ``next_player``                  int8[B]
    step_count     ``step_count`` (starts at 1)     int16[B]
    last_move1/2   move history                     int16[B]
    ko_location    simple-ko point or INVALID       int16[B]
    ko_color       forbidden (retaking) color       int8[B]
    ko_age         moves since ko was given         int16[B]
    terminated     GoState._terminated
                   (go_env.h:10-17)                 bool[B]
    =============  ======================================================

    ``last_placed`` (board.h:13) is intentionally dropped: it only feeds
    ``getHistoryMap``/``getHistoryExp`` (board_feature.cc:114-139), which none
    of the shipped encoders (encode9/10/13) use.
    """

    stones: jnp.ndarray
    next_player: jnp.ndarray
    step_count: jnp.ndarray
    last_move1: jnp.ndarray
    last_move2: jnp.ndarray
    ko_location: jnp.ndarray
    ko_color: jnp.ndarray
    ko_age: jnp.ndarray
    terminated: jnp.ndarray

    @property
    def batch_shape(self):
        return self.stones.shape[:-1]

    @staticmethod
    def new(batch_shape, size: int) -> "GoState":
        """Empty boards — clearBoard (board.cc:13-26)."""
        n = size * size
        b = tuple(batch_shape) if not isinstance(batch_shape, int) else (batch_shape,)
        return GoState(
            stones=jnp.zeros(b + (n,), jnp.int8),
            next_player=jnp.full(b, BLACK, jnp.int8),
            step_count=jnp.ones(b, jnp.int16),
            last_move1=jnp.full(b, INVALID, jnp.int16),
            last_move2=jnp.full(b, INVALID, jnp.int16),
            ko_location=jnp.full(b, INVALID, jnp.int16),
            ko_color=jnp.zeros(b, jnp.int8),
            ko_age=jnp.zeros(b, jnp.int16),
            terminated=jnp.zeros(b, bool),
        )
