"""tkinter click-board for human play (reference human_play.py:14-323).

Re-creates both reference modes — ``Human_vs_human`` (human_play.py:14-131)
and ``Human_vs_bot`` (human_play.py:133-323) — on top of the batched engine
and search. The interaction logic (click snapping, capture redraw via board
diffing, game session state) lives in display-free helpers so it is testable
headlessly; the Tk widget layer only draws.

Differences from the reference, by design:
  * stones and the grid are canvas primitives — no PNG assets to ship
    (the reference blits go_gui/{board_9,b_9,w_9}.png);
  * the bot thinks in a worker thread while the UI polls with ``after``
    (the reference polls a Ray-style flag at 100 ms — human_play.py:262);
  * any Config/checkpoint works, not just a hard-wired pickle path.

Run:  python -m transgo_tpu.ui.board_gui [--checkpoint <orbax-dir>] [--human]
"""

from __future__ import annotations

import threading
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transgo_tpu.config import Config
from transgo_tpu.ops import BLACK, EMPTY, WHITE, GoEngine

# ---------------------------------------------------------------------------
# display-free interaction logic
# ---------------------------------------------------------------------------


def snap_to_point(px: float, py: float, origin: float, cell: float,
                  size: int, tol_frac: float = 0.45) -> int:
    """Map a canvas click to a board action, or -1 when off-grid.

    The click snaps to the nearest intersection (human_play.py:280-287
    snaps by rounding to the grid pitch); clicks farther than
    ``tol_frac * cell`` from any intersection are ignored.
    """
    col = round((px - origin) / cell)
    row = round((py - origin) / cell)
    if not (0 <= col < size and 0 <= row < size):
        return -1
    dx = px - (origin + col * cell)
    dy = py - (origin + row * cell)
    if dx * dx + dy * dy > (tol_frac * cell) ** 2:
        return -1
    return int(row) * size + int(col)


def board_delta(old: np.ndarray, new: np.ndarray) -> Tuple[list, list]:
    """(added, removed) point lists between two flat stone arrays.

    ``added``   — [(point, color), ...] stones to draw;
    ``removed`` — [point, ...] stones to erase (captures).
    The reference redraws by diffing ``board_grid`` after every move
    (human_play.py:246-249, environment.py:145-151); same idea, one pass.
    """
    old = np.asarray(old).ravel()
    new = np.asarray(new).ravel()
    added = [(int(i), int(new[i]))
             for i in np.nonzero((old != new) & (new != EMPTY))[0]]
    removed = [int(i)
               for i in np.nonzero((old != new) & (new == EMPTY))[0]]
    return added, removed


class GameSession:
    """Engine + optional search agent behind the GUI (display-free).

    Mirrors the GTP front-end's state handling (ui/gtp.py) with integer
    actions; the bot answers with fresh-root ``select_action`` exactly like
    the reference's GUI agent (human_play.py:163,219).
    """

    def __init__(self, config: Optional[Config] = None, variables=None,
                 bot: bool = True):
        self.config = cfg = config or Config()
        self.engine = GoEngine(cfg.board_size, cfg.komi, cfg.max_step)
        self.size = self.engine.spec.size
        self.pass_action = self.engine.spec.num_points
        self._select = None
        if bot:
            from transgo_tpu.models import build_network
            from transgo_tpu.search.evalfn import make_eval_fn
            from transgo_tpu.search.mcts import MCTS, SearchMode

            mcts = MCTS(cfg, self.engine, SearchMode.WP)
            network = build_network(cfg, "main")
            variables = variables or network.init(jax.random.PRNGKey(0))
            eval_fn = make_eval_fn(
                network, variables, komi=cfg.komi,
                own_blend=cfg.value_own_blend, tanh_norm=cfg.tanh_norm,
            )
            self._select = jax.jit(
                lambda s, k: mcts.select_action(s, eval_fn, k)
            )
        self.key = jax.random.PRNGKey(cfg.seed)
        self.resigned = 0  # color that resigned, or 0
        self.new_game()

    # -- state ---------------------------------------------------------
    def new_game(self):
        self.state = self.engine.init(1)
        self.history: List = [self.state]
        self.resigned = 0

    @property
    def stones(self) -> np.ndarray:
        return np.asarray(self.state.stones[0])

    @property
    def to_play(self) -> int:
        return int(self.state.next_player[0])

    @property
    def game_over(self) -> bool:
        return bool(self.state.terminated[0]) or self.resigned != 0

    @property
    def last_move(self) -> int:
        return int(self.state.last_move1[0])

    # -- moves ---------------------------------------------------------
    def play(self, action: int) -> bool:
        """Apply a human move; False when illegal / game over."""
        if self.game_over:
            return False
        if action != self.pass_action and not bool(
            self.engine.legal_action_mask_full(self.state)[0, action]
        ):
            return False
        self.state, _ = self.engine.step(self.state, jnp.array([action]))
        self.history.append(self.state)
        return True

    def bot_move(self) -> int:
        """Let the agent answer; returns its action (safe off-thread)."""
        assert self._select is not None, "session built with bot=False"
        if self.game_over:
            return -1
        self.key, k = jax.random.split(self.key)
        action = int(self._select(self.state, k)[0])
        self.state, _ = self.engine.step(self.state, jnp.array([action]))
        self.history.append(self.state)
        return action

    def resign(self):
        self.resigned = self.to_play

    def undo(self, plies: int = 1) -> bool:
        if len(self.history) <= plies:
            return False
        del self.history[-plies:]
        self.state = self.history[-1]
        self.resigned = 0
        return True

    def result(self) -> str:
        if self.resigned:
            winner = "W" if self.resigned == BLACK else "B"
            return f"{winner}+Resign"
        score = float(self.engine.score(self.state)[0])
        return f"B+{score:g}" if score > 0 else f"W+{-score:g}"


# ---------------------------------------------------------------------------
# Tk layer (requires a display)
# ---------------------------------------------------------------------------

CELL = 46
MARGIN = 40
BOARD_BG = "#d9a95d"


class BoardGUI:
    """Canvas board: click to play, bot replies from a worker thread."""

    def __init__(self, session: GameSession, human_color: int = BLACK):
        import tkinter as tk

        self.tk = tk
        self.session = session
        self.human_color = human_color
        size = session.size
        side = 2 * MARGIN + (size - 1) * CELL

        self.root = tk.Tk()
        self.root.title("transgo_tpu")
        self.canvas = tk.Canvas(self.root, width=side, height=side,
                                bg=BOARD_BG, highlightthickness=0)
        self.canvas.pack()
        self.status = tk.Label(self.root, text="Black to play", anchor="w")
        self.status.pack(fill="x")
        bar = tk.Frame(self.root)
        bar.pack(fill="x")
        for label, cmd in (
            ("Pass", self.on_pass), ("Resign", self.on_resign),
            ("Undo", self.on_undo), ("New game", self.on_new),
        ):
            tk.Button(bar, text=label, command=cmd).pack(side="left")

        self.canvas.bind("<Button-1>", self.on_click)
        self._stone_items = {}
        self._marker = None
        self._pending: list = []   # bot thread -> UI handoff
        self._thinking = False
        self._draw_grid()
        self._redraw(np.zeros_like(self.session.stones))
        self.root.after(100, self._poll)   # reference cadence

    # -- drawing -------------------------------------------------------
    def _xy(self, point: int):
        size = self.session.size
        return (MARGIN + (point % size) * CELL,
                MARGIN + (point // size) * CELL)

    def _draw_grid(self):
        size = self.session.size
        lo, hi = MARGIN, MARGIN + (size - 1) * CELL
        for i in range(size):
            p = MARGIN + i * CELL
            self.canvas.create_line(lo, p, hi, p)
            self.canvas.create_line(p, lo, p, hi)
        stars = {3: (1,), 5: (2,), 7: (3,), 9: (2, 4, 6),
                 13: (3, 6, 9), 19: (3, 9, 15)}.get(size, ())
        for r in stars:
            for c in stars:
                x, y = MARGIN + c * CELL, MARGIN + r * CELL
                self.canvas.create_oval(x - 3, y - 3, x + 3, y + 3,
                                        fill="black")

    def _redraw(self, prev: np.ndarray):
        added, removed = board_delta(prev, self.session.stones)
        for p in removed:
            self.canvas.delete(self._stone_items.pop(p))
        rad = CELL // 2 - 2
        for p, color in added:
            x, y = self._xy(p)
            fill = "black" if color == BLACK else "white"
            self._stone_items[p] = self.canvas.create_oval(
                x - rad, y - rad, x + rad, y + rad,
                fill=fill, outline="black")
        if self._marker is not None:
            self.canvas.delete(self._marker)
            self._marker = None
        last = self.session.last_move
        if 0 <= last < self.session.pass_action and last in self._stone_items:
            x, y = self._xy(last)
            on_black = self.session.stones[last] == BLACK
            self._marker = self.canvas.create_oval(
                x - 5, y - 5, x + 5, y + 5,
                outline="white" if on_black else "black", width=2)
        self._update_status()

    def _update_status(self):
        s = self.session
        if s.game_over:
            self.status.config(text=f"Game over: {s.result()}")
        elif self._thinking:
            self.status.config(text="Bot is thinking...")
        else:
            mover = "Black" if s.to_play == BLACK else "White"
            self.status.config(text=f"{mover} to play")

    # -- events --------------------------------------------------------
    def _human_turn(self) -> bool:
        s = self.session
        if s.game_over or self._thinking:
            return False
        return s._select is None or s.to_play == self.human_color

    def on_click(self, event):
        if not self._human_turn():
            return
        action = snap_to_point(event.x, event.y, MARGIN, CELL,
                               self.session.size)
        if action < 0:
            return
        self._apply_human(action)

    def on_pass(self):
        if self._human_turn():
            self._apply_human(self.session.pass_action)

    def on_resign(self):
        if self._human_turn():
            self.session.resign()
            self._update_status()

    def on_undo(self):
        if self._thinking:
            return
        # with a bot, undo a full human+bot round (human_play.py undoes 2)
        plies = 2 if self.session._select is not None else 1
        prev = self.session.stones.copy()
        if self.session.undo(plies):
            self._redraw(prev)

    def on_new(self):
        if self._thinking:
            return
        prev = self.session.stones.copy()
        self.session.new_game()
        self._redraw(prev)

    def _apply_human(self, action: int):
        prev = self.session.stones.copy()
        if not self.session.play(action):
            self.status.config(text="Illegal move")
            return
        self._redraw(prev)
        if self.session._select is not None and not self.session.game_over:
            self._thinking = True
            self._update_status()
            threading.Thread(target=self._bot_worker, daemon=True).start()

    def _bot_worker(self):
        prev = self.session.stones.copy()
        self.session.bot_move()
        self._pending.append(prev)

    def _poll(self):
        while self._pending:
            prev = self._pending.pop(0)
            self._thinking = False
            self._redraw(prev)
        self.root.after(100, self._poll)

    def run(self):
        self.root.mainloop()


def main():  # pragma: no cover - needs a display
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--human", action="store_true",
                    help="human vs human (no bot)")
    ap.add_argument("--white", action="store_true",
                    help="play White against the bot")
    args = ap.parse_args()

    variables = None
    if args.checkpoint:
        from pathlib import Path

        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            Path(args.checkpoint).absolute())
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
    import tkinter

    session = GameSession(variables=variables, bot=not args.human)
    try:
        gui = BoardGUI(session, human_color=WHITE if args.white else BLACK)
    except tkinter.TclError as e:
        raise SystemExit(
            f"board_gui needs a display ({e}); "
            "use `python -m transgo_tpu.ui.gtp` for terminal play"
        )
    gui.run()


if __name__ == "__main__":  # pragma: no cover
    main()
