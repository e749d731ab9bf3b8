"""Single source of truth for every tunable in the framework.

Mirrors the reference's hand-edited ``configure.py`` class
(/root/reference/configure.py:5-103) — same knobs, same defaults, same four
schedule functions — but as one dataclass consumed by *every* layer (engine,
nets, search, runtime), eliminating the reference's triple-vendored constants
that had to agree by hand (reference GoEnv/environment.py:9-12 vs
go_comm.h:20,29 vs configure.py:9).

TPU-specific additions (batch sizes, tree capacity, mesh shape, dtypes) live
in the same place; they have no referent in the reference, which parallelized
with 6 Ray actor processes (reference transgo.py:92-101) instead of a batch
dimension.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass
class Config:
    # ---------- environment (reference configure.py:9-16) ----------
    board_size: int = 9
    local_board_size: int = 7          # 7x7 sub-board for scale transfer
    encode_state_channels: int = 10    # 9 / 10 / 13 feature planes
    komi: float = 7.5
    black: int = 1
    white: int = 2
    # hard game-length cutoff; 0 = auto per board size: 120 for 9x9 and
    # 74 for 7x7 (the reference's constants, configure.py:16 /
    # scale_train_bound/GoEnv/environment.py:37 — both ~1.5 points per
    # intersection), 1.5*n rounded to even for other sizes (542 at 19x19)
    max_step: int = 0

    # ---------- replay buffer (reference configure.py:19-21) ----------
    buffer_size: int = 1_500_000
    is_save_buffer: bool = True
    store_batch: int = 5               # rolling save slots for buffer segments
    # prioritized replay (the reference ships a dormant PER variant,
    # replay_buffer.py:102-245 / scale_train_live configure.py:24-26)
    use_per: bool = False
    priority_exponent: float = 0.45
    # keep the replay ring in device HBM and fuse sample+augment+train into
    # one jitted step (no per-step host traffic). Falls back to the host
    # buffer for augment_mode="eager" or use_per=True.
    device_replay: bool = True
    # D4 augmentation policy:
    #   "sample" (TPU default) — store raw positions, apply a random
    #            symmetry per sample at train time;
    #   "eager"  — reference-exact: append 8 pre-rotated copies per position
    #            (self_play.py:943-965);
    #   "none"   — raw only (the scale_train recipes append raw,
    #            scale_train_live/self_play.py:276-277).
    augment_mode: str = "sample"

    # ---------- self-play (reference configure.py:24-33) ----------
    game_total_num: float = 1e8
    play_workers_num: int = 6          # kept for parity; TPU uses game batch
    c_puct: float = 3.0                # used by classic MCTS / WU_UCT
    c_puct1: float = 3.0               # WP prior coefficient
    c_puct2: float = 0.05              # WP variance-bonus coefficient
    virtual_loss: float = 3.0          # classic-MCTS virtual loss
    num_simulation: int = 210
    tanh_norm: float = 0.55            # transfer-value tanh scale
    wu_loss: int = 2                   # WU-UCT unobserved-sample increment
    parallel_readouts: int = 4         # leaf-parallel eval batch per tree
    dirichlet_alpha: float = 0.03      # root noise (reference self_play.py:46)
    dirichlet_frac: float = 0.25
    eval_temperature: float = 0.12     # arena temperature (self_play.py:190)

    # ---------- network / training (reference configure.py:36-42) ----------
    input_dim: int = 10                # == encode_state_channels
    num_features: int = 128
    l2_const: float = 1e-4
    # NOTE: the reference's checkpoint_interval (push weights to
    # SharedStorage every 3 train steps, trainer.py:76-79) has no referent
    # here — self-play reads the learner's params directly every tick, so
    # weight "broadcast" is continuous by construction (like CPUActor,
    # obsolete in the one-program design).
    adjust_lr: bool = True
    learn_rate: float = 6.5e-5
    batch_size: int = 2048
    adam_b1: float = 0.5               # reference trainer.py:33
    adam_b2: float = 0.999
    # loss = value + 0.75*own + 1.15*policy + 0.02*entropy (trainer.py:71)
    value_loss_weight: float = 1.0
    own_loss_weight: float = 0.75
    policy_loss_weight: float = 1.15
    entropy_loss_weight: float = 0.02

    # ---------- evaluation / gating (reference configure.py:45-46) ----------
    init_evaluate_score: int = 100
    # Ticks between arena gates. NOTE a semantic shift vs the reference
    # (configure.py:46): its driver ticked at 1 Hz, so 1500 ≈ 25 min of
    # wall time; here a tick is one run_tick — a fused CHUNK of
    # ~selfplay_chunk_ticks search rounds in continuous mode — so 1500
    # chunks ≈ 40 min at the production 9x9 config. Cadence is by work
    # done, not wall time, which keeps gating deterministic under resume.
    evaluate_num: int = 1500
    evaluate_games: int = 10           # arena games per eval (self_play.py:987)

    # ---------- resume (reference configure.py:50-60) ----------
    # init_model: orbax policy dir (a _save_policy artifact: params +
    # batch_stats) loaded into the pipeline's network at construction —
    # model-only resume (reference transgo.py:71-77). Full resume (opt
    # state + counters + buffer) is TrainPipeline.load_checkpoint.
    init_model: Optional[str] = None
    init_buffer: Optional[list] = None
    init_sub_model: Optional[str] = None
    load_train_steps: Optional[int] = None
    load_play_steps: Optional[int] = None
    load_play_games: Optional[int] = None

    # ---------- throttle (reference configure.py:64-65) ----------
    train_play_ratio: float = 7500 / 100000
    adjust_train_play_ratio: bool = True
    # test hook: break UCB ties by lowest action index (see
    # search.mcts.MCTS.deterministic_ties)
    deterministic_tie_break: bool = False
    # cap on catch-up train steps per tick: a cold start / resume owes
    # ratio*play_steps steps the moment the first game lands, and an
    # uncapped catch-up burst blocks self-play for minutes; capping spreads
    # the debt over ticks while games keep flowing (the reference's
    # trainer caught up while its actor processes kept playing,
    # trainer.py:94-105). 0 disables the cap.
    max_train_per_tick: int = 64
    # overlapped tick (fused continuous path only): dispatch the train
    # burst and the next self-play chunk before reading the previous
    # chunk's stats, hiding the per-tick device->host readback behind
    # device work; the ratio controller sees counters one chunk late
    overlap_train_selfplay: bool = True

    # ---------- leaf-eval value shaping (scale_train recipes) ----------
    # v = (1-b)*v_net + b*tanh(tanh_norm*(sum(own)+komi_signed))
    # (scale_train_live/self_play.py:176-185; 0.0 disables)
    value_own_blend: float = 0.0
    # unvisited children score Q=0 instead of minus the parent's value
    # (scale_train UCB, scale_train_live/self_play.py:149-156)
    child_init_zero: bool = False

    # ---------- transfer (reference self_play.py:803, configure.py:82) ----
    transfer_max_train_steps: int = 3500
    transfer_policy_temperature: float = 0.45  # self_play.py:823
    transfer_pass_prob: float = 1e-5           # self_play.py:820
    # feature width of the pretrained 7x7 sub-model loaded via
    # init_sub_model (None -> num_features); must match the checkpoint
    sub_model_features: Optional[int] = None

    # ---------- paths ----------
    results_path: str = "./results1"
    record_train: str = "train_record.txt"

    # ---------- TPU runtime (no reference equivalent) ----------
    selfplay_batch: int = 64           # games stepped in lockstep per chip
    # continuous self-play: per-board move boundaries (one search round per
    # tick; each board moves the tick its own visit target is hit) instead
    # of batch-lockstep moves — removes the straggler barrier that flattens
    # throughput at large selfplay_batch
    continuous_selfplay: bool = False
    # fused ticks per device call in continuous mode (one host sync per
    # chunk; finished games append to the device replay inside the chunk)
    selfplay_chunk_ticks: int = 16
    # search rounds between move-boundary phases inside the fused chunk.
    # The boundary phase (subtree promotion over [B,M,A], trajectory
    # writes, root expansion eval, noise, drain/reset) costs ~8x a search
    # round at the production shape (profiled r5: ~60 ms vs ~7.5 ms at
    # B=256) while only ~B/rounds_per_move boards are ready per round;
    # batching boundaries every k rounds amortizes that cost k-fold at the
    # price of a board idling up to k-1 rounds after hitting its visit
    # target (~(k-1)/2 per ~53-round move, ~3% at k=4). PER-MOVE SEARCH
    # SEMANTICS ARE UNCHANGED: same visit target, same noise/temperature/
    # pi/reuse rules — only the boundary-check cadence changes. Clamped to
    # selfplay_chunk_ticks; rounds per chunk = (chunk_ticks//k)*k.
    # Measured at the flagship shape (tools/profile_chunk.py, r5):
    # k=1 ~80 moves/s, k=4 264, k=8 288.5 (B=256); k=16 gains <5% more
    # at 2x the boundary latency, so 8 is the default.
    selfplay_boundary_every: int = 8
    # fused-chunk per-tick device-replay append budget; 0 = auto
    # (max(32, B/8)). Finished games beyond it defer to later ticks.
    append_budget: int = 0
    # desynchronize game completions (continuous mode): play
    # k~U{0..max_step//4} uniform-random legal opening moves per board
    # before the FIRST generation's trees are built, so finishes spread
    # over ~max_step//4 ticks instead of arriving in batch-sized waves
    # that starve the per-game LR/gate controllers for hundreds of ticks
    # (VERDICT r3 weak #3: now_play_games sat at 256 for ~200 ticks at
    # B=256). The reference's actors were naturally desynced processes
    # (transgo.py:92-96); lockstep sync is an artifact of the batch
    # design. Later generations inherit the spread.
    stagger_init: bool = True
    # checkpoint ring persistence: the device replay ring is read back to
    # host in bounded slices (ring_save_slice_mb each) under one wall-clock
    # budget (ring_save_timeout seconds); if the budget runs out or a
    # transfer wedges, the save DEGRADES to params+opt_state+counters only
    # instead of hanging the run (the r4 flagship run's final save wedged
    # on a single ~2 GB readback through the device tunnel)
    ring_save_slice_mb: int = 64
    ring_save_timeout: float = 300.0
    max_nodes: int = 0                 # MCTS tree capacity; 0 = auto
    # static bound on recorded search-path depth. Backup/incomplete scatters
    # scale with it, so keep it tight; a deeper descent falls back to a
    # no-op round (bounded by the search's max_rounds guard) and is counted
    # in the depth_capped telemetry. 0 = auto: min(max_step + 2, 64) up to
    # 9x9 and 96 above. The old flat 48 at 9x9 bound routinely late-game
    # (reused subtrees reach depths near the 120-move game length —
    # VERDICT r2 weak #3, measured in results_ladder/train_record.txt);
    # 64 covers the observed descent depths while keeping the backup
    # scatter cost bounded. Pass max_step explicitly to uncap.
    search_max_depth: int = 0
    tree_reuse: bool = True            # subtree promotion across moves
    compute_dtype: str = "bfloat16"    # net compute dtype on TPU
    param_dtype: str = "float32"
    mesh_shape: Tuple[int, ...] = (1,)           # (data,) — learner/actor mesh
    mesh_axis_names: Tuple[str, ...] = ("data",)
    seed: int = 0

    # ------------------------------------------------------------------
    def __post_init__(self):
        self.input_dim = self.encode_state_channels
        if self.max_step == 0:
            n = self.board_size * self.board_size
            self.max_step = {7: 74, 9: 120}.get(
                self.board_size, int(round(1.5 * n / 2)) * 2
            )
        if self.search_max_depth == 0:
            self.search_max_depth = (
                min(self.max_step + 2, 64) if self.board_size <= 9 else 96
            )
        if self.max_nodes == 0:
            # room for one move's simulations + reused subtree + slack
            self.max_nodes = 2 * self.num_simulation + 64

    @property
    def num_actions(self) -> int:
        return self.board_size * self.board_size + 1

    # ---------- schedule functions (reference configure.py:75-103) ----------
    # temperature schedule constants (reference configure.py:75-79); the
    # search and actor hot paths call epsilon_by_frame with traced arrays,
    # so these are the single source of truth for all three call sites
    epsilon_start: float = 1.0
    epsilon_final: float = 0.65
    epsilon_decay: float = 10.0

    def epsilon_by_frame(self, game_step):
        """Self-play temperature: decays 1.0 -> 0.65 with game step
        (reference configure.py:75-79). Accepts python scalars and traced
        jnp arrays alike."""
        e0, e1, tau = self.epsilon_start, self.epsilon_final, self.epsilon_decay
        if isinstance(game_step, (int, float)):
            return e1 + (e0 - e1) * math.exp(-1.0 * game_step / tau)
        import jax.numpy as jnp

        return e1 + (e0 - e1) * jnp.exp(-game_step / tau)

    def value_ratio_by_frame(self, now_train_steps) -> float:
        """Scale-transfer blend weight gamma: decays 1 -> 0, tau ~= 1200
        (reference configure.py:82-86)."""
        start, final, decay = 1.0, 0.0, 1200.0
        return final + (start - final) * math.exp(-1.0 * now_train_steps / decay)

    def ad_lr(self, now_play_games: int, current_lr: float) -> float:
        """Halve the LR every 1500 games until the floor
        (reference configure.py:90-93)."""
        if (
            (now_play_games + 1) % 1500 == 0
            and now_play_games < 3100
            and current_lr > 0.5 * 0.5 * 6.5e-5
        ):
            return current_lr * 0.5
        return current_lr

    def ad_train_play_ratio(
        self, now_play_steps: int, current_train_play_ratio: float
    ) -> float:
        """Ramp the train:play ratio by 1e-5 every 6 play steps up to 0.26
        (reference configure.py:97-103)."""
        if (now_play_steps + 1) % 6 == 0 and current_train_play_ratio < 2.6 / 10:
            return (current_train_play_ratio * 100000 + 1) / 100000
        return current_train_play_ratio


def small_test_config(**overrides) -> Config:
    """A tiny configuration for fast CPU tests."""
    defaults = dict(
        board_size=5,
        max_step=30,
        num_simulation=16,
        selfplay_batch=4,
        num_features=16,
        batch_size=16,
        buffer_size=4096,
    )
    defaults.update(overrides)
    return Config(**defaults)
