"""ctypes binding + build helper for the C++ rules oracle.

Counterpart of the reference's GoEnv/environment.py ctypes layer, but used
only for differential tests — the production path is transgo_tpu.ops.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "oracle.cc"
_SO = _HERE / "liboracle.so"


def build_oracle(force: bool = False) -> Path:
    """Compile oracle.cc to liboracle.so if needed."""
    if _SO.exists() and not force:
        if _SO.stat().st_mtime >= _SRC.stat().st_mtime:
            return _SO
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


class _CState(ctypes.Structure):
    _fields_ = [
        ("stones", ctypes.c_int8 * (19 * 19)),
        ("next_player", ctypes.c_int32),
        ("step_count", ctypes.c_int32),
        ("last_move1", ctypes.c_int32),
        ("last_move2", ctypes.c_int32),
        ("ko_location", ctypes.c_int32),
        ("ko_color", ctypes.c_int32),
        ("ko_age", ctypes.c_int32),
        ("terminated", ctypes.c_int32),
    ]


class Oracle:
    """One oracle-backed game (single board, host-side)."""

    def __init__(self, size: int = 9, komi: float = 7.5, max_step: int = 120):
        lib = ctypes.cdll.LoadLibrary(str(build_oracle()))
        assert lib.oracle_state_size() == ctypes.sizeof(_CState)
        lib.oracle_init.argtypes = [ctypes.c_int, ctypes.c_float, ctypes.c_int]
        lib.oracle_step.argtypes = [ctypes.POINTER(_CState), ctypes.c_int]
        lib.oracle_step.restype = ctypes.c_int
        lib.oracle_legal_mask.argtypes = [
            ctypes.POINTER(_CState), ctypes.POINTER(ctypes.c_uint8)
        ]
        lib.oracle_territory.argtypes = [
            ctypes.POINTER(_CState), ctypes.POINTER(ctypes.c_int8)
        ]
        lib.oracle_territory.restype = ctypes.c_float
        lib.oracle_score.argtypes = [ctypes.POINTER(_CState)]
        lib.oracle_score.restype = ctypes.c_float
        lib.oracle_encode.argtypes = [
            ctypes.POINTER(_CState), ctypes.POINTER(ctypes.c_float), ctypes.c_int
        ]
        self.lib = lib
        self.size = size
        self.n = size * size
        lib.oracle_init(size, komi, max_step)
        self.state = _CState()
        self.reset()

    def reset(self):
        self.lib.oracle_reset(ctypes.byref(self.state))

    def step(self, action: int) -> bool:
        """Apply action; returns True if it was legal/applied."""
        return bool(self.lib.oracle_step(ctypes.byref(self.state), int(action)))

    @property
    def terminated(self) -> bool:
        return bool(self.state.terminated)

    def stones(self) -> np.ndarray:
        return np.ctypeslib.as_array(self.state.stones)[: self.n].copy()

    def legal_mask(self) -> np.ndarray:
        out = (ctypes.c_uint8 * self.n)()
        self.lib.oracle_legal_mask(ctypes.byref(self.state), out)
        return np.ctypeslib.as_array(out).astype(bool)

    def territory(self):
        out = (ctypes.c_int8 * self.n)()
        raw = self.lib.oracle_territory(ctypes.byref(self.state), out)
        return raw, np.ctypeslib.as_array(out).copy()

    def score(self) -> float:
        return float(self.lib.oracle_score(ctypes.byref(self.state)))

    def encode(self, planes: int = 10) -> np.ndarray:
        """[planes, size, size] float32, reference CHW layout."""
        out = (ctypes.c_float * (planes * self.n))()
        self.lib.oracle_encode(ctypes.byref(self.state), out, planes)
        return (
            np.ctypeslib.as_array(out)
            .reshape(planes, self.size, self.size)
            .copy()
        )
