"""Native (C++) components: the rules oracle used for differential testing.

The reference shipped its rules as a C++ shared library driven over ctypes
(GoEnv/go_env.so); here the production rules path is the XLA-compiled engine
in ``transgo_tpu.ops`` and the C++ code serves as an independent oracle.
"""

from transgo_tpu.native.oracle import Oracle, build_oracle  # noqa: F401
