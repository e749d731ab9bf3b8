"""Pure-JAX vectorized Go engine.

Replaces the reference's C++ board engine + ctypes binding
(/root/reference/GoEnv/cpp_src/board.cc, go_env.cc, GoEnv/environment.py)
with XLA-compiled array code: board state is a struct of arrays with a leading
batch dimension, every rule (capture, ko, suicide, scoring, features) is a
batched tensor op, and thousands of boards step in lockstep under ``jit``.
"""

from transgo_tpu.ops.state import (  # noqa: F401
    BLACK,
    WHITE,
    EMPTY,
    PASS,
    RESIGN,
    INVALID,
    BoardSpec,
    GoState,
)
from transgo_tpu.ops.engine import (  # noqa: F401
    GoEngine,
)
from transgo_tpu.ops.ladder import (  # noqa: F401
    LadderReader,
)
