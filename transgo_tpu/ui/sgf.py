"""Minimal SGF (FF[4]) encode/parse for game records.

The reference has no game-record format at all (its GUI keeps only the
live board, human_play.py:133-323); SGF is the standard interchange every
Go tool speaks, so the GTP engine grows ``printsgf``/``loadsgf`` on top of
this module. Scope is deliberately small: single game tree, no
variations (the main line is the first branch), B/W move properties plus
SZ/KM/RE headers — enough to round-trip our own records and load plain
game files from other engines.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from transgo_tpu.ops.state import BLACK, WHITE

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def action_to_sgf(action: int, size: int) -> str:
    """Internal action -> SGF point ('' = pass; row 0 is the top in both)."""
    if action < 0 or action >= size * size:
        return ""
    x, row = action % size, action // size
    return _ALPHA[x] + _ALPHA[row]


def sgf_to_action(point: str, size: int) -> int:
    """SGF point -> internal action; '' or 'tt' (size <= 19) = pass."""
    p = point.strip().lower()
    if p == "" or (p == "tt" and size <= 19):
        return size * size
    if len(p) != 2 or p[0] not in _ALPHA[:size] or p[1] not in _ALPHA[:size]:
        raise ValueError(f"invalid SGF point: {point!r}")
    x, row = _ALPHA.index(p[0]), _ALPHA.index(p[1])
    return row * size + x


def moves_to_sgf(size: int, komi: float,
                 moves: List[Tuple[int, int]],
                 result: Optional[str] = None) -> str:
    """Encode a game: moves = [(color BLACK/WHITE, action), ...]."""
    props = [f"FF[4]GM[1]CA[UTF-8]AP[transgo_tpu]SZ[{size}]KM[{komi:g}]"]
    if result:
        props.append(f"RE[{result}]")
    nodes = []
    for color, action in moves:
        tag = "B" if color == BLACK else "W"
        nodes.append(f";{tag}[{action_to_sgf(action, size)}]")
    return "(;" + "".join(props) + "".join(nodes) + ")"


_PROP_RE = re.compile(r"([A-Z]{1,2})((?:\[[^\]]*\])+)")
_VAL_RE = re.compile(r"\[([^\]]*)\]")


def parse_sgf(text: str):
    """-> (size, komi, moves) from the main line of a single game tree.

    Variations are skipped: parsing follows the first branch only (the
    standard main line), matching what ``loadsgf`` needs.
    """
    body = text.strip()
    if not body.startswith("("):
        raise ValueError("not an SGF game tree")
    # keep only the main line: drop every nested subtree after the first
    depth = 0
    main: List[str] = []
    seen_branch = False
    for ch in body:
        if ch == "(":
            depth += 1
            if depth > 1:
                seen_branch = True
        elif ch == ")":
            depth -= 1
        elif depth == 1 and not seen_branch:
            main.append(ch)
    line = "".join(main)

    size, komi = 19, 7.5
    moves: List[Tuple[int, int]] = []
    for name, raw_vals in _PROP_RE.findall(line):
        vals = _VAL_RE.findall(raw_vals)
        if name == "SZ":
            size = int(vals[0])
        elif name == "KM":
            komi = float(vals[0])
        elif name in ("B", "W"):
            moves.append(
                (BLACK if name == "B" else WHITE, vals[0])
            )
    return size, komi, [
        (c, sgf_to_action(p, size)) for c, p in moves
    ]
