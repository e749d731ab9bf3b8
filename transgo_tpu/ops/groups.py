"""Batched connected-component and liberty analysis.

Replaces the reference's incrementally-maintained block linked lists and their
merge/kill/recompute machinery (/root/reference/GoEnv/cpp_src/board.cc:90-428:
``StoneLibertyAnalysis``, ``MergeStoneToBlock``, ``MergeTwoBlocks``,
``RecomputeBlockLiberty``) with whole-board label propagation: every stone
starts labeled with its own coordinate, labels flow to the minimum over
same-colored neighbors until convergence, so a group's id is the smallest
coordinate it occupies (== the reference's ``Block.start`` for a freshly
rebuilt board). Liberties are then one deduplicated per-stone count folded
by a single one-hot MXU matmul (segment sum by group root), and members
read group totals back through the same one-hot (``root_read``) — there is
NO data-dependent gather or scatter anywhere in the analysis, because on
TPU those lower to serialized per-element loops ~1000x slower than the
static-shift + matmul forms (measured: a pointer-jump gather alone cost
~5 ms/round at B=4096, n=81).

Two formulations live here:

- ``group_stats`` (production): convergence-checked propagation rounds
  over [B, n, 4] static neighbor tables (one fused VPU kernel per round;
  rounds track the largest group diameter actually present) plus one-hot
  matmuls for the per-group aggregates. Peak intermediate is O(B n)
  (+ the one-hot operand).
- ``reachability`` / ``stone_reachability`` / ``group_stats_dense``
  (utility): the transitive-closure-by-repeated-squaring formulation over
  dense [B, n, n] adjacency. At 9x9 both are fast; at 19x19 the 9 squarings
  of a [B, 361, 361] tensor are pure HBM-bandwidth burn (~19 GB of traffic
  per 4096-board analyze — measured 46.7K env-steps/s in round 2 vs 1.18M
  at 9x9), which is why the label path is the default. The dense path
  remains for the superko hasher (whole-group XOR reads rows off it) and as
  the differential oracle for the label path.

Everything is data-parallel over the batch and the board — no divergent
control flow, so XLA maps it straight onto the VPU/MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from transgo_tpu.ops.state import EMPTY, WALL, BoardSpec

# NBR direction ordering is [(-1,0), (0,-1), (1,0), (0,1)] (state.py), so
# direction d seen from the neighbor is OPP[d]
_OPP = (2, 3, 0, 1)


def _pad1(x: jnp.ndarray, fill) -> jnp.ndarray:
    """Append a sentinel column so index ``n`` reads ``fill`` (off-board)."""
    pad = jnp.full(x.shape[:-1] + (1,), fill, x.dtype)
    return jnp.concatenate([x, pad], axis=-1)


# neighbor deltas in NBR order (state.py:66): (dx, dy) per direction
_DELTAS = ((-1, 0), (0, -1), (1, 0), (0, 1))


def _shift2d(v: jnp.ndarray, dx: int, dy: int, fill) -> jnp.ndarray:
    """out[b, r, c] = v[b, r+dy, c+dx], ``fill`` off-board ([B, H, W])."""
    f = jnp.asarray(fill, v.dtype)
    if dy == -1:
        v = jnp.concatenate(
            [jnp.full_like(v[:, :1], f), v[:, :-1]], axis=1
        )
    elif dy == 1:
        v = jnp.concatenate(
            [v[:, 1:], jnp.full_like(v[:, :1], f)], axis=1
        )
    if dx == -1:
        v = jnp.concatenate(
            [jnp.full_like(v[:, :, :1], f), v[:, :, :-1]], axis=2
        )
    elif dx == 1:
        v = jnp.concatenate(
            [v[:, :, 1:], jnp.full_like(v[:, :, :1], f)], axis=2
        )
    return v


def propagate_min_labels(spec: BoardSpec, linked: jnp.ndarray,
                         init: jnp.ndarray) -> jnp.ndarray:
    """Shared min-label flood fill: exact n-round hop propagation.

    Args:
      linked: bool[B, n, 4] — propagation edges (neighbor d usable).
      init:   int32[B, n]  — initial labels; inert points carry ``n``.

    TPU note: the body is pure pad/slice grid shifts + elementwise min on
    the [B, H, W] board grid — no gather/scatter HLO anywhere, so XLA
    fuses the whole ``fori_loop`` into one VPU kernel that never leaves
    VMEM. n rounds cover the longest possible in-group geodesic, making
    the result exact for EVERY shape (serpentines, spirals, adversarial
    coordinate orders) with a static trip count. Measured on a v5e chip:
    81 rounds at [4096, 81] in 0.04 ms — ~100x faster than a
    convergence-checked ``while_loop`` of the same body (per-round host
    sync + erratic multi-minute Mosaic compiles at some batch sizes) and
    ~1000x faster than pointer-jumping (data-dependent gathers serialize
    on TPU).
    """
    n = spec.num_points
    h = w = spec.size
    b = init.shape[0]
    # per-direction [B, H, W] planes: a stacked [..., 4] layout would put
    # the 4-wide axis on the 128-lane minor dimension (32x padding waste
    # and a Mosaic compile blow-up observed at some batch sizes)
    lg = linked.reshape(b, h, w, 4)
    links4 = tuple(lg[..., d] for d in range(4))
    init_g = init.reshape(b, h, w)

    def body(_, lbl):
        new = lbl
        for d, (dx, dy) in enumerate(_DELTAS):
            nv = _shift2d(lbl, dx, dy, n)
            new = jnp.minimum(new, jnp.where(links4[d], nv, n))
        return new

    return lax.fori_loop(0, n, body, init_g).reshape(b, n)


def propagate_group_values(spec: BoardSpec, linked: jnp.ndarray,
                           values: jnp.ndarray) -> jnp.ndarray:
    """Broadcast per-root values to every member: max-propagation over the
    same edges (the gather-free read-back counterpart of
    :func:`propagate_min_labels`; values must be >= 0 and nonzero only at
    group roots).

    Args:
      linked: bool[B, n, 4] — group edges.
      values: int32/float32[B, n, K] — per-root payload, 0 elsewhere.

    Returns [B, n, K] with every group member holding its root's payload.
    Same n-round fused-shift fori as the label pass (~0.05 ms at
    [4096, 81] on a v5e) — replaces a [B, n, n] one-hot einsum read-back
    that cost ~50x more in HBM traffic.
    """
    n = spec.num_points
    h = w = spec.size
    b, _, k = values.shape
    # per-channel and per-direction [B, H, W] planes (lane-tiling note in
    # propagate_min_labels)
    planes = tuple(
        values[:, :, c].reshape(b, h, w) for c in range(k)
    )
    lg = linked.reshape(b, h, w, 4)
    links4 = tuple(lg[..., d] for d in range(4))

    def body(_, vs):
        out = []
        for v in vs:
            new = v
            for d, (dx, dy) in enumerate(_DELTAS):
                nv = _shift2d(v, dx, dy, 0)
                new = jnp.maximum(new, jnp.where(links4[d], nv, 0))
            out.append(new)
        return tuple(out)

    final = lax.fori_loop(0, n, body, planes)
    return jnp.stack([v.reshape(b, n) for v in final], axis=-1)


def stone_links(spec: BoardSpec, stones: jnp.ndarray) -> jnp.ndarray:
    """bool[B, n, 4]: same-colored-stone adjacency per direction — the
    propagation edge set shared by the label pass and the value
    read-back (built with grid shifts; no gather)."""
    b = stones.shape[0]
    h = w = spec.size
    sg = stones.reshape(b, h, w)
    is_stone = sg > EMPTY
    links = [
        is_stone & (_shift2d(sg, dx, dy, WALL) == sg)
        for dx, dy in _DELTAS
    ]
    return jnp.stack(links, axis=-1).reshape(b, spec.num_points, 4)


def stone_labels(spec: BoardSpec, stones: jnp.ndarray,
                 links: jnp.ndarray | None = None) -> jnp.ndarray:
    """int32[B, n]: min group coordinate per stone, sentinel ``n`` at
    empty points (the raw label-propagation output)."""
    n = spec.num_points
    is_stone = stones > EMPTY
    if links is None:
        links = stone_links(spec, stones)
    iota = jnp.arange(n, dtype=jnp.int32)[None, :]
    init = jnp.where(is_stone, iota, n)
    return propagate_min_labels(spec, links, init)


def group_labels(spec: BoardSpec, stones: jnp.ndarray) -> jnp.ndarray:
    """Connected components of same-colored stones.

    Args:
      stones: int8[B, n] with 0 empty / 1 black / 2 white.

    Returns:
      int32[B, n]: for each stone, the minimum coordinate in its group
      (the group "root"); ``-1`` for empty points.
    """
    lbl = stone_labels(spec, stones)
    return jnp.where(stones > EMPTY, lbl, -1)


def label_onehot(labels: jnp.ndarray, n: int,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """bf16[B, root, i] one-hot of each point's label.

    The shared operand for BOTH directions of per-group aggregation:
    fold per-point values to per-root totals (:func:`segment_sum_by_label`)
    and broadcast per-root values back to members (:func:`root_read`) —
    each ONE bf16 MXU matmul. This is the TPU-native replacement for
    scatter-add / data-dependent gather, which lower to serialized
    per-element loops (measured ~1000x slower than the matmul forms at
    B=4096).
    """
    iota = jnp.arange(n, dtype=labels.dtype)
    onehot = labels[:, None, :] == iota[None, :, None]    # [B, root, i]
    if valid is not None:
        onehot = onehot & valid[:, None, :]
    return onehot.astype(jnp.bfloat16)


def segment_sum_by_label(labels: jnp.ndarray, values: jnp.ndarray,
                         n: int, onehot: jnp.ndarray | None = None
                         ) -> jnp.ndarray:
    """Per-root sums: out[b, r, k] = sum_i [labels[b, i] == r] values[b, i, k].

    One one-hot bf16 matmul on the MXU — the TPU-native segment sum (an
    index scatter-add lowers to a serialized update loop on TPU). Values
    must be small non-negative integers (counts): bf16 represents them
    exactly and the f32 accumulation is exact far past n <= 361.
    """
    if onehot is None:
        onehot = label_onehot(labels, n)
    return jnp.matmul(
        onehot, values.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def root_read(onehot: jnp.ndarray, by_root: jnp.ndarray) -> jnp.ndarray:
    """Members read their root's value: out[b, i, k] = by_root[b, lbl[i], k]
    — the gather-free inverse of :func:`segment_sum_by_label`, contracting
    the SAME one-hot over the root axis (points whose one-hot column is
    all-zero read 0). The value operand is f32, not bf16: per-group counts
    reach n = 361, past bf16's 256 exact-integer ceiling."""
    return jnp.einsum(
        "bri,brk->bik", onehot.astype(jnp.float32),
        by_root.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


class GroupStats(NamedTuple):
    """Per-root aggregates plus handy per-point views (all batched)."""

    labels: jnp.ndarray        # int32[B, n] group root per stone, -1 empty
    libs_by_root: jnp.ndarray  # int32[B, n] liberties, valid at root coords
    size_by_root: jnp.ndarray  # int32[B, n] stones in group, valid at roots
    stone_libs: jnp.ndarray    # int32[B, n] liberties of the point's group
    stone_size: jnp.ndarray    # int32[B, n] size of the point's group


def group_stats(spec: BoardSpec, stones: jnp.ndarray,
                labels: jnp.ndarray | None = None) -> GroupStats:
    """Liberty and size counts per group (board.cc:392-428 equivalent).

    Liberties are TRUE distinct liberties (not pseudo-liberties): an empty
    point adjacent to a group through several member stones counts once.
    Dedup without any [B, n, n] tensor: for each empty point e, among its
    4 neighbor directions, only the FIRST direction carrying each distinct
    group label contributes — and that (e, d) contribution is credited to
    the member stone NBR[e, d] it came through. Per-stone credits then fold
    to per-group totals with one one-hot matmul (segment_sum_by_label), and
    members read their group's totals back by one gather off the root.
    """
    links = stone_links(spec, stones)
    if labels is None:
        lbl = stone_labels(spec, stones, links=links)
    else:
        lbl = jnp.where(labels >= 0, labels, spec.num_points)
    n = spec.num_points
    is_stone = stones > EMPTY
    is_empty = stones == EMPTY

    # all neighbor reads as grid shifts ([B, H, W] planes, no gather HLO)
    h = w = spec.size
    b = stones.shape[0]
    lbl_g = lbl.reshape(b, h, w)
    is_empty_g = is_empty.reshape(b, h, w)
    is_stone_g = is_stone.reshape(b, h, w)

    # first[d][e]: direction d is the first occurrence of its (stone)
    # label among empty point e's neighbor directions — the distinct-
    # liberty dedup (labels at empty/off-board read the sentinel n, which
    # the stone_nbr test filters)
    nbr_lbl4 = [_shift2d(lbl_g, dx, dy, n) for dx, dy in _DELTAS]
    stone_nbr4 = [x < n for x in nbr_lbl4]
    first4 = [stone_nbr4[0] & is_empty_g]
    for d in range(1, 4):
        dup = nbr_lbl4[d] == nbr_lbl4[0]
        for d2 in range(1, d):
            dup = dup | (nbr_lbl4[d] == nbr_lbl4[d2])
        first4.append(stone_nbr4[d] & ~dup & is_empty_g)

    # credit each kept (e, d) to the stone j = e + delta_d it came
    # through: from j's side that is first[d] read at j - delta_d
    p_lib_g = sum(
        _shift2d(first4[d], -dx, -dy, False).astype(jnp.int32)
        for d, (dx, dy) in enumerate(_DELTAS)
    )
    p_lib = jnp.where(is_stone_g, p_lib_g, 0).reshape(b, n)

    # per-group totals [size, libs] in ONE matmul; members then read them
    # back by max-propagating the root rows over the same edges — no
    # data-dependent gather anywhere in the analysis
    vals = jnp.stack(
        [is_stone.astype(jnp.int32), p_lib], axis=-1
    )                                                     # [B, n, 2]
    agg = segment_sum_by_label(lbl, vals, n)              # [B, n, 2] f32
    agg = agg.astype(jnp.int32)

    out_labels = jnp.where(is_stone, lbl, -1)
    is_root = is_stone & (out_labels == jnp.arange(n, dtype=jnp.int32)[None])
    # by-root arrays are zero off true roots (matches the dense oracle)
    root_rows = jnp.where(is_root[..., None], agg, 0)     # [B, n, 2]
    size_by_root = root_rows[..., 0]
    libs_by_root = root_rows[..., 1]

    per_stone = propagate_group_values(spec, links, root_rows)
    stone_size = jnp.where(is_stone, per_stone[..., 0], 0)
    stone_libs = jnp.where(is_stone, per_stone[..., 1], 0)
    return GroupStats(
        out_labels, libs_by_root, size_by_root, stone_libs, stone_size
    )


# ----------------------------------------------------------------------
# dense [B, n, n] reachability formulation (superko hasher + differential
# oracle for the label path; also used by the empty-region variant in
# tests)
# ----------------------------------------------------------------------

def reachability(spec: BoardSpec, linked: jnp.ndarray) -> jnp.ndarray:
    """Transitive closure of a symmetric adjacency by repeated squaring.

    Args:
      linked: bool[B, n, n] — direct edges (need not include self loops).

    Returns:
      bool[B, n, n] with self-reach included for every vertex.

    This is the MXU formulation of flood fill: R <- (R @ R > 0), doubling
    covered path length per squaring, so ``spec.REACH_ROUNDS`` (= ceil log2
    of the longest path) matmuls connect any group. Operands are always
    bf16: every entry is exactly 0.0 or 1.0 (both representable in bf16),
    products accumulate in f32 on the MXU (``preferred_element_type``), and
    path counts are bounded by n <= 361, far inside f32's exact-integer
    range — so the ``> 0.5`` nonzero test is exact at every board size.
    """
    n = spec.num_points
    dtype = jnp.bfloat16
    eye = jnp.eye(n, dtype=dtype)
    r = linked.astype(dtype) + eye

    def body(_, r):
        rr = jnp.matmul(r, r, preferred_element_type=jnp.float32)
        return (rr > 0.5).astype(dtype)

    r = lax.fori_loop(0, spec.REACH_ROUNDS, body, r)
    return r > jnp.asarray(0.5, dtype)


def stone_reachability(spec: BoardSpec, stones: jnp.ndarray) -> jnp.ndarray:
    """bool[B, n, n]: same-colored-group reachability (stones only)."""
    is_stone = stones > EMPTY
    same = (
        (stones[:, :, None] == stones[:, None, :])
        & is_stone[:, :, None]
        & is_stone[:, None, :]
    )
    linked = same & (spec.ADJ[None] > 0)
    reach = reachability(spec, linked)
    # restrict self-reach to stones
    return reach & is_stone[:, :, None] & is_stone[:, None, :]


def group_stats_dense(spec: BoardSpec, stones: jnp.ndarray) -> GroupStats:
    """The dense-reachability formulation of :func:`group_stats` — kept as
    the in-repo differential oracle (tests assert both paths agree on
    random boards at 5/9/19)."""
    n = spec.num_points
    is_stone = stones > EMPTY
    is_empty = stones == EMPTY
    reach = stone_reachability(spec, stones)
    mm_dtype = jnp.bfloat16
    reach_f = reach.astype(mm_dtype)

    stone_size = jnp.sum(reach, axis=2).astype(jnp.int32)

    m = jnp.matmul(reach_f, spec.ADJ[None].astype(mm_dtype),
                   preferred_element_type=jnp.float32)   # [B, n, n]
    adj_empty = (m > 0.5) & is_empty[:, None, :]
    stone_libs = jnp.sum(adj_empty, axis=2).astype(jnp.int32)
    stone_libs = jnp.where(is_stone, stone_libs, 0)

    iota = jnp.arange(n, dtype=jnp.int32)[None, None, :]
    labels = jnp.min(jnp.where(reach, iota, n), axis=2)
    labels = jnp.where(is_stone, labels, -1)

    safe_lbl = jnp.clip(labels, 0, n - 1)
    b = stones.shape[0]
    libs_by_root = jnp.zeros((b, n), jnp.int32)
    libs_by_root = jax.vmap(lambda acc, t, v: acc.at[t].max(v))(
        libs_by_root, safe_lbl, stone_libs
    )
    size_by_root = jnp.zeros((b, n), jnp.int32)
    size_by_root = jax.vmap(lambda acc, t, v: acc.at[t].max(v))(
        size_by_root, safe_lbl, stone_size
    )
    is_root = is_stone & (labels == jnp.arange(n, dtype=jnp.int32)[None])
    libs_by_root = jnp.where(is_root, libs_by_root, 0)
    size_by_root = jnp.where(is_root, size_by_root, 0)
    return GroupStats(
        labels, libs_by_root, size_by_root, stone_libs, stone_size
    )
