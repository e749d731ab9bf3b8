"""Flax policy/value/ownership networks (reference: model.py,
scale_train/*/model.py)."""

from transgo_tpu.models.nets import (  # noqa: F401
    AlphaZeroNetwork,
    MainNetwork,
    MiniNetwork,
    TransGoNetwork,
    build_network,
)
