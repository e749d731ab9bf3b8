"""ctypes binding for the GENUINE reference go_env.so (differential tests).

Unlike :mod:`transgo_tpu.native.oracle` (our independently-written C++
oracle), this module compiles the *actual* reference C++ sources from
``/root/reference`` — root GoEnv (9x9, MAX_BLOCK=64) and the
scale_train_bound vendored copy (7x7, MAX_BLOCK=32) — and binds the
``extern "C"`` API declared in go_env.h:23-71 with byte-exact struct
mirrors of board.h:9-58 / go_env.h:10-17. It exists purely so that
``tests/test_vs_reference.py`` can prove the JAX engine's trajectories
match the reference implementation itself, not just our own oracle.

The ctypes layouts here are written against board.h directly (the
reference's own environment.py:17-29 mirror omits ``num_blocks`` and
mis-types ``removed_block_ids`` — it only survives because its struct
happens to be larger than the real one).
"""

from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path("/root/reference")
_BUILD_DIR = Path(__file__).resolve().parent / "_refbuild"

#: cpp_src directory per board size (go_comm.h:20 sets BOARD_SIZE per copy)
_SRC_DIRS = {
    9: REFERENCE_ROOT / "GoEnv" / "cpp_src",
    7: REFERENCE_ROOT / "scale_train" / "scale_train_bound" / "GoEnv" / "cpp_src",
}

#: MAX_BLOCK per build (go_comm.h:29 — 64 for 9x9, 32 for the 7x7 copy)
_MAX_BLOCK = {9: 64, 7: 32}


def reference_available() -> bool:
    return all(d.is_dir() for d in _SRC_DIRS.values())


def build_reference_so(size: int, force: bool = False) -> Path:
    """Compile the reference sources exactly as GoEnv/Makefile:1-9 does."""
    src_dir = _SRC_DIRS[size]
    so = _BUILD_DIR / f"go_env_{size}x{size}.so"
    srcs = sorted(src_dir.glob("*.cc"))
    if so.exists() and not force:
        if so.stat().st_mtime >= max(s.stat().st_mtime for s in srcs):
            return so
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", *map(str, srcs), "-std=gnu++11", "-shared", "-fPIC",
           "-o", str(so)]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        # surface the compiler diagnostics — a bare CalledProcessError
        # with captured (discarded) stderr is undebuggable (ADVICE r2)
        raise RuntimeError(
            f"reference .so build failed (rc={r.returncode}):\n"
            f"{' '.join(cmd)}\n{r.stderr}"
        )
    return so


@functools.lru_cache(maxsize=None)
def _layouts(size: int):
    """Byte-exact ctypes mirrors of board.h:9-58 and go_env.h:10-17."""
    max_coord = size * size
    max_block = _MAX_BLOCK[size]

    class CInfo(ctypes.Structure):  # board.h:9-14
        _fields_ = [
            ("color", ctypes.c_uint8),        # Stone
            ("id", ctypes.c_int16),           # BlockId
            ("next", ctypes.c_int16),         # Coord
            ("last_placed", ctypes.c_uint16),
        ]

    class CBlock(ctypes.Structure):  # board.h:18-23
        _fields_ = [
            ("color", ctypes.c_uint8),
            ("start", ctypes.c_int16),
            ("num_stones", ctypes.c_int16),
            ("liberties", ctypes.c_int16),
        ]

    class CBoard(ctypes.Structure):  # board.h:27-58 (true field order)
        _fields_ = [
            ("infos", CInfo * max_coord),
            ("blocks", CBlock * max_block),
            ("num_blocks", ctypes.c_int16),
            ("removed_block_ids", ctypes.c_int16 * 4),  # BlockId[4]
            ("num_block_removed", ctypes.c_int16),
            ("next_player", ctypes.c_uint8),
            ("step_count", ctypes.c_uint16),
            ("last_move1", ctypes.c_int16),
            ("last_move2", ctypes.c_int16),
            ("ko_location", ctypes.c_int16),
            ("ko_color", ctypes.c_uint8),
            ("ko_age", ctypes.c_int16),
        ]

    class CGoState(ctypes.Structure):  # go_env.h:10-17 (MAX_HISTORY_DIM=1)
        _fields_ = [
            ("_boards", CBoard * 1),
            ("_terminated", ctypes.c_bool),
        ]

    return CInfo, CBlock, CBoard, CGoState


class ReferenceEnv:
    """The genuine reference engine, one loaded .so per board size.

    API mirrors GoEnv (reference environment.py:32-199); each method
    documents the extern-C entry it calls (go_env.cc line refs).
    """

    def __init__(self, size: int = 9, komi: float = 7.5,
                 max_step: int = 120, encoded_dim: int = 10):
        if size not in _SRC_DIRS:
            raise ValueError(f"reference builds exist for sizes {sorted(_SRC_DIRS)}")
        self.size = size
        self.n = size * size
        self.pass_action = self.n
        self.komi = komi
        self.encoded_dim = encoded_dim
        _, _, _, self.CGoState = _layouts(size)

        lib = ctypes.cdll.LoadLibrary(str(build_reference_so(size)))
        c_state_p = ctypes.POINTER(self.CGoState)
        f32_p = np.ctypeslib.ndpointer(ctypes.c_float)
        i32_p = np.ctypeslib.ndpointer(ctypes.c_int32)

        lib.Init.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             ctypes.c_float]
        lib.Init.restype = ctypes.c_bool
        assert lib.Init(1, encoded_dim, max_step, komi)  # go_env.cc:20-31

        lib.Reset.argtypes = [c_state_p]                  # go_env.cc:34
        lib.Step.argtypes = [c_state_p, c_state_p, ctypes.c_int]  # :44
        lib.Step.restype = ctypes.c_bool
        lib.checkAction.argtypes = [c_state_p, ctypes.c_int]      # :84
        lib.checkAction.restype = ctypes.c_bool
        lib.isTerminated.argtypes = [c_state_p]                   # :91
        lib.isTerminated.restype = ctypes.c_bool
        lib.Encode.argtypes = [c_state_p, f32_p]                  # :96
        lib.Encode.restype = ctypes.c_bool
        lib.getScore.argtypes = [c_state_p]                       # :126
        lib.getScore.restype = ctypes.c_float
        lib.getTerritory.argtypes = [c_state_p, f32_p]            # :136
        lib.getTerritory.restype = ctypes.c_float
        lib.getLegalAction.argtypes = [c_state_p, i32_p]          # :154
        lib.getLegalAction.restype = ctypes.c_int
        lib.getLegalNoEye.argtypes = [c_state_p, i32_p]           # :178
        lib.getLegalNoEye.restype = ctypes.c_int
        lib.getPlayer.argtypes = [c_state_p]                      # :208
        lib.getPlayer.restype = ctypes.c_int
        lib.getStep.argtypes = [c_state_p]                        # :213
        lib.getStep.restype = ctypes.c_int
        if size == 9:  # getSubEncode only exists in the root build
            lib.getSubEncode.argtypes = [f32_p, f32_p, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int]
        self.lib = lib
        self.state = self.CGoState()
        self.reset()

    # -- state lifecycle ---------------------------------------------------
    def reset(self):
        self.lib.Reset(ctypes.byref(self.state))

    def step(self, action: int) -> bool:
        """Apply action (n == PASS, as go_env.cc:56-57); returns done."""
        new_state = self.CGoState()
        done = self.lib.Step(ctypes.byref(self.state),
                             ctypes.byref(new_state), int(action))
        self.state = new_state
        return bool(done)

    # -- observations ------------------------------------------------------
    @property
    def board(self):
        return self.state._boards[0]

    @property
    def terminated(self) -> bool:
        return bool(self.state._terminated)

    def stones(self) -> np.ndarray:
        """infos[c].color grid, int8[n]."""
        return np.array([self.board.infos[c].color for c in range(self.n)],
                        dtype=np.int8)

    def check_action(self, action: int) -> bool:
        return bool(self.lib.checkAction(ctypes.byref(self.state), int(action)))

    def encode(self) -> np.ndarray:
        out = np.zeros((self.encoded_dim, self.size, self.size), np.float32)
        assert self.lib.Encode(ctypes.byref(self.state), out)
        return out

    def score(self) -> float:
        """Tromp-Taylor minus komi (go_env.cc:126-130)."""
        return float(self.lib.getScore(ctypes.byref(self.state)))

    def territory(self):
        """(score_with_komi, signed territory +1/0/-1) — go_env.cc:136-149."""
        terr = np.zeros(self.n, np.float32)
        score = float(self.lib.getTerritory(ctypes.byref(self.state), terr))
        return score, terr

    def legal_mask(self) -> np.ndarray:
        """Boolean mask over board points (PASS excluded) from getLegalAction."""
        acts = np.zeros(self.n + 1, np.int32)
        k = self.lib.getLegalAction(ctypes.byref(self.state), acts)
        mask = np.zeros(self.n, bool)
        pts = acts[:k]
        mask[pts[pts < self.n]] = True
        return mask

    def legal_no_eye_mask(self) -> np.ndarray:
        acts = np.zeros(self.n + 1, np.int32)
        k = self.lib.getLegalNoEye(ctypes.byref(self.state), acts)
        mask = np.zeros(self.n, bool)
        pts = acts[:k]
        mask[pts[pts < self.n]] = True
        return mask

    def player(self) -> int:
        return int(self.lib.getPlayer(ctypes.byref(self.state)))

    def step_count(self) -> int:
        return int(self.lib.getStep(ctypes.byref(self.state)))

    def sub_encode(self, encode: np.ndarray, sub_size: int = 7,
                   cut_num: int = 4) -> np.ndarray:
        """get_sub_encode crops (board.cc:1166-1270), root build only."""
        assert self.size == 9
        out = np.zeros((cut_num, self.encoded_dim, sub_size, sub_size),
                       np.float32)
        self.lib.getSubEncode(np.ascontiguousarray(encode, np.float32), out,
                              sub_size, self.encoded_dim, cut_num)
        return out
