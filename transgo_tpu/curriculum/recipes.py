"""Config factories for the two 7x7 curriculum pipelines.

The reference vendors two full copies of its stack under ``scale_train/``
(SURVEY.md section 2.2): a true-7x7 pipeline (``scale_train_bound``) and a
"live-edge" pipeline training a 7x7 window inside a real 9x9 board
(``scale_train_live``). Here each recipe is just a Config — the single
engine/search/runtime stack specializes by values, not by copy-pasted trees.

Divergent reference knobs captured (scale_train_*/configure.py):
  board 7x7 / komi 6.5 / max_step 74, 120 simulations, c_puct 3,
  synchronous single-leaf search (no leaf parallelism,
  scale_train_bound/self_play.py:50-199), zero-init child Q
  (scale_train_live/self_play.py:149-156), ownership value blend
  v = 0.9*v + 0.1*tanh(0.45*(sum own + komi)) (self_play.py:176-185),
  own-loss weight 0.85 (scale_train_bound/trainer.py:70).
"""

from __future__ import annotations

from transgo_tpu.config import Config


def scale_bound_config(**overrides) -> Config:
    """True 7x7 board pre-training (scale_train_bound)."""
    defaults = dict(
        board_size=7,
        local_board_size=7,
        komi=6.5,
        max_step=74,
        num_simulation=120,
        parallel_readouts=1,       # synchronous single-tree search
        c_puct=3.0,
        child_init_zero=True,
        value_own_blend=0.1,
        tanh_norm=0.45,
        own_loss_weight=0.85,      # scale_train_bound/trainer.py:70
        play_workers_num=8,
        augment_mode="none",       # scale_train appends raw samples only
    )
    defaults.update(overrides)
    return Config(**defaults)


def scale_live_config(**overrides) -> Config:
    """7x7 live window inside a 9x9 board (scale_train_live): play is
    restricted to the top-left window; each game starts with 4-11 random
    stones on the window's boundary ring so the model learns edges that are
    alive rather than walls (get_random_init_action,
    scale_train_live/GoEnv/environment.py:146-158;
    reset_root, self_play.py:206-216)."""
    defaults = dict(
        board_size=9,              # the real board stays 9x9
        local_board_size=7,
        komi=6.5,
        max_step=74,
        num_simulation=120,
        parallel_readouts=1,
        c_puct=3.0,
        child_init_zero=True,
        value_own_blend=0.1,
        tanh_norm=0.45,
        own_loss_weight=0.85,      # scale_train_live/trainer.py:73 (0.85)
        play_workers_num=8,
        augment_mode="none",       # window semantics are not D4-symmetric
    )
    defaults.update(overrides)
    return Config(**defaults)


def build_scale_bound_pipeline(quiet: bool = True, **overrides):
    """TrainPipeline wired for the true-7x7 recipe."""
    from transgo_tpu.runtime.pipeline import TrainPipeline
    from transgo_tpu.search.mcts import SearchMode

    cfg = scale_bound_config(**overrides)
    return TrainPipeline(cfg, SearchMode.CLASSIC, net_kind="mini",
                         quiet=quiet)


def build_scale_live_pipeline(quiet: bool = True, **overrides):
    """TrainPipeline wired for the 7x7-window-in-9x9 recipe."""
    from transgo_tpu.curriculum.live_window import (
        LiveWindowEncoder,
        LiveWindowEngine,
    )
    from transgo_tpu.runtime.pipeline import TrainPipeline
    from transgo_tpu.search.mcts import SearchMode

    cfg = scale_live_config(**overrides)
    engine = LiveWindowEngine(cfg)
    return TrainPipeline(
        cfg, SearchMode.CLASSIC, net_kind="mini", engine=engine,
        encoder=LiveWindowEncoder(engine), quiet=quiet,
    )
