"""Curriculum pre-training recipes (reference: scale_train/scale_train_bound,
scale_train/scale_train_live) and the WP scale-transfer evaluation mix."""

from transgo_tpu.curriculum.recipes import (  # noqa: F401
    build_scale_bound_pipeline,
    build_scale_live_pipeline,
    scale_bound_config,
    scale_live_config,
)
from transgo_tpu.curriculum.live_window import LiveWindowEngine  # noqa: F401
from transgo_tpu.curriculum.transfer import make_transfer_eval_fn  # noqa: F401
