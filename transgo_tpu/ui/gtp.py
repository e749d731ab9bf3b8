"""GTP (Go Text Protocol) front-end.

The reference ships a tkinter click-board (human_play.py:133-323) that loads
a pickled model and answers with fresh-root MCTS ``select_action`` moves
(human_play.py:163,219). A GTP engine is the TPU-native equivalent with a
wider reach: any GTP client (GoGui, Sabaki, gtp CLI) can play the trained
model, and the same interface scripts engine-vs-engine matches.

Supported commands: protocol_version, name, version, list_commands,
known_command, boardsize, clear_board, komi, play, genmove, showboard,
final_score, undo, printsgf, loadsgf, quit (SGF records via ui/sgf.py —
a capability the reference GUI lacks entirely).

Run:  python -m transgo_tpu.ui.gtp --checkpoint <orbax-dir>
"""

from __future__ import annotations

import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transgo_tpu.config import Config
from transgo_tpu.models import build_network
from transgo_tpu.ops import BLACK, GoEngine, WHITE
from transgo_tpu.search.mcts import MCTS, SearchMode

GTP_COLS = "ABCDEFGHJKLMNOPQRST"  # no I


class GTPEngine:
    def __init__(self, config: Optional[Config] = None, variables=None,
                 mode: SearchMode = SearchMode.WP):
        self.config = config or Config()
        cfg = self.config
        self.engine = GoEngine(cfg.board_size, cfg.komi, cfg.max_step)
        self.mcts = MCTS(cfg, self.engine, mode)
        self.network = build_network(cfg, "main")
        self.variables = variables or self.network.init(jax.random.PRNGKey(0))
        self.key = jax.random.PRNGKey(cfg.seed)
        self._rebuild_select()
        self.history: List = []
        self.clear_board()

    def _rebuild_select(self):
        """(Re)trace the search closure. Called at construction and whenever
        ``komi`` changes: the eval fn bakes komi into the jitted program, so
        a ``komi`` GTP command must invalidate it (round-1 staleness bug)."""
        eval_fn = self._eval_fn(self.variables)
        self._select = jax.jit(
            lambda states, key: self.mcts.select_action(states, eval_fn, key)
        )

    # ------------------------------------------------------------------
    def _eval_fn(self, variables):
        from transgo_tpu.search.evalfn import make_eval_fn

        return make_eval_fn(
            self.network, variables, komi=self.config.komi,
            own_blend=self.config.value_own_blend,
            tanh_norm=self.config.tanh_norm,
        )

    def clear_board(self):
        self.state = self.engine.init(1)
        self.history = [self.state]
        # move groups aligned with history entries (a play that injects a
        # pass for the other side records both in one group, so undo stays
        # in sync); flattened by printsgf
        self.move_groups: List[List] = [[]]

    # ---- coordinates -------------------------------------------------
    def vertex_to_action(self, vertex: str) -> int:
        v = vertex.strip().upper()
        size = self.engine.spec.size
        if v == "PASS":
            return size * size
        if v == "RESIGN":
            return -2
        if (
            len(v) < 2
            or v[0] not in GTP_COLS[:size]
            or not v[1:].isdigit()
            or not 1 <= int(v[1:]) <= size
        ):
            raise ValueError(f"invalid vertex: {vertex}")
        x = GTP_COLS.index(v[0])
        y = int(v[1:]) - 1          # GTP row 1 = bottom
        row = size - 1 - y          # internal row 0 = top
        return row * size + x

    def action_to_vertex(self, action: int) -> str:
        size = self.engine.spec.size
        if action == size * size or action == -1:
            return "pass"
        if action == -2:
            return "resign"
        x = action % size
        row = action // size
        return f"{GTP_COLS[x]}{size - row}"

    # ---- commands ----------------------------------------------------
    def _apply(self, want: int, action: int) -> List:
        """Step a move for color ``want``, injecting a pass if it is not
        the mover (GTP allows out-of-turn setup; the engine strictly
        alternates). Returns the (color, action) records applied."""
        group = []
        player = int(self.state.next_player[0])
        if player != want:
            self.state, _ = self.engine.step(
                self.state, jnp.array([self.engine.spec.num_points])
            )
            group.append((player, self.engine.spec.num_points))
        if action >= 0 and not bool(
            self.engine.legal_action_mask_full(self.state)[0, action]
        ):
            raise ValueError("illegal move")
        self.state, _ = self.engine.step(self.state, jnp.array([action]))
        group.append((want, action))
        return group

    def cmd_play(self, color: str, vertex: str) -> str:
        action = self.vertex_to_action(vertex)
        want = BLACK if color.lower().startswith("b") else WHITE
        group = self._apply(want, action)
        self.history.append(self.state)
        self.move_groups.append(group)
        return ""

    def cmd_genmove(self, color: str) -> str:
        want = BLACK if color.lower().startswith("b") else WHITE
        group = []
        if int(self.state.next_player[0]) != want:
            # out-of-turn request: inject a pass for the side to move
            other = int(self.state.next_player[0])
            self.state, _ = self.engine.step(
                self.state, jnp.array([self.engine.spec.num_points])
            )
            group.append((other, self.engine.spec.num_points))
        self.key, k = jax.random.split(self.key)
        action = int(self._select(self.state, k)[0])
        self.state, _ = self.engine.step(self.state, jnp.array([action]))
        group.append((want, action))
        self.history.append(self.state)
        self.move_groups.append(group)
        return self.action_to_vertex(action)

    def cmd_showboard(self) -> str:
        size = self.engine.spec.size
        grid = np.asarray(self.state.stones[0]).reshape(size, size)
        sym = {0: ".", 1: "X", 2: "O"}
        lines = ["   " + " ".join(GTP_COLS[:size])]
        for r in range(size):
            row = " ".join(sym[int(v)] for v in grid[r])
            lines.append(f"{size - r:2d} {row}")
        return "\n" + "\n".join(lines)

    def cmd_final_score(self) -> str:
        score = float(self.engine.score(self.state)[0])
        if score > 0:
            return f"B+{score:g}"
        return f"W+{-score:g}"

    def cmd_undo(self) -> str:
        if len(self.history) < 2:
            raise ValueError("nothing to undo")
        self.history.pop()
        self.move_groups.pop()
        self.state = self.history[-1]
        return ""

    def cmd_printsgf(self) -> str:
        from transgo_tpu.ui.sgf import moves_to_sgf

        moves = [m for g in self.move_groups for m in g]
        result = None
        if bool(self.state.terminated[0]):
            result = self.cmd_final_score()
        return moves_to_sgf(
            self.engine.spec.size, self.engine.komi, moves, result
        )

    def cmd_loadsgf(self, path: str, move_number: int = 0) -> str:
        from transgo_tpu.ui.sgf import parse_sgf

        with open(path) as f:
            size, komi, moves = parse_sgf(f.read())
        if size != self.engine.spec.size:
            raise ValueError(
                f"unacceptable size (engine is {self.engine.spec.size})"
            )
        if komi != self.engine.komi:
            self.engine.komi = komi
            self.config.komi = komi
            self._rebuild_select()
        self.clear_board()
        if move_number > 0:
            moves = moves[:move_number]
        for color, action in moves:
            group = self._apply(color, action)
            self.history.append(self.state)
            self.move_groups.append(group)
        return ""

    COMMANDS = [
        "protocol_version", "name", "version", "list_commands",
        "known_command", "boardsize", "clear_board", "komi", "play",
        "genmove", "showboard", "final_score", "undo", "printsgf",
        "loadsgf", "quit",
    ]

    def handle(self, line: str):
        """Returns (response, is_error, should_quit)."""
        parts = line.strip().split()
        if not parts:
            return None, False, False
        ident = ""
        if parts[0].isdigit():
            ident = parts[0]
            parts = parts[1:]
        cmd, args = parts[0].lower(), parts[1:]
        try:
            if cmd == "protocol_version":
                resp = "2"
            elif cmd == "name":
                resp = "transgo-tpu"
            elif cmd == "version":
                from transgo_tpu import __version__

                resp = __version__
            elif cmd == "list_commands":
                resp = "\n".join(self.COMMANDS)
            elif cmd == "known_command":
                resp = "true" if args and args[0] in self.COMMANDS else "false"
            elif cmd == "boardsize":
                if int(args[0]) != self.engine.spec.size:
                    raise ValueError("unacceptable size")
                resp = ""
            elif cmd == "clear_board":
                self.clear_board()
                resp = ""
            elif cmd == "komi":
                new_komi = float(args[0])
                if new_komi != self.engine.komi:
                    self.engine.komi = new_komi
                    self.config.komi = new_komi
                    self._rebuild_select()  # komi is baked into the jit
                resp = ""
            elif cmd == "play":
                resp = self.cmd_play(args[0], args[1])
            elif cmd == "genmove":
                resp = self.cmd_genmove(args[0])
            elif cmd == "showboard":
                resp = self.cmd_showboard()
            elif cmd == "final_score":
                resp = self.cmd_final_score()
            elif cmd == "undo":
                resp = self.cmd_undo()
            elif cmd == "printsgf":
                resp = self.cmd_printsgf()
            elif cmd == "loadsgf":
                resp = self.cmd_loadsgf(
                    args[0], int(args[1]) if len(args) > 1 else 0
                )
            elif cmd == "quit":
                return f"={ident} \n\n", False, True
            else:
                return f"?{ident} unknown command\n\n", True, False
            return f"={ident} {resp}\n\n", False, False
        except Exception as e:  # noqa: BLE001
            return f"?{ident} {e}\n\n", True, False

    def serve(self, infile=sys.stdin, outfile=sys.stdout):
        for line in infile:
            out, _, quit_ = self.handle(line)
            if out is not None:
                outfile.write(out)
                outfile.flush()
            if quit_:
                return


def main():  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()
    variables = None
    if args.checkpoint:
        import orbax.checkpoint as ocp
        from pathlib import Path

        restored = ocp.StandardCheckpointer().restore(
            Path(args.checkpoint).absolute()
        )
        variables = {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }
    GTPEngine(variables=variables).serve()


if __name__ == "__main__":  # pragma: no cover
    main()
