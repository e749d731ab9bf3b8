"""Golden-search parity: the reference's three search loops re-realized as
a slow host-Python fixture, diffed against the batched array MCTS.

``RefSearch`` is a faithful single-tree realization of the reference
engines (WU_UCT self_play.py:98-332, MCTS 335-572, WP_MCTS 575-875):
object-graph nodes, per-path env stepping, pseudo-expansion with zero
priors, incomplete/complete updates with the reference's exact revert
rules — including the WU ons-leak-on-duplicate quirk (complete_update
returns early WITHOUT reverting, self_play.py:246-253) versus WP/classic's
unconditional reverts (self_play.py:653, 406-407), raw (un-renormalized)
root priors at reset (self_play.py:600-605) versus renormalized leaf
priors (self_play.py:738-741), child-Q seeded to minus the parent value,
value() = vs/(n+1), and WP's Welford mean/var tracking (self_play.py:84-88).

Both sides run the SAME deterministic stub eval (distinct per-action
priors, so UCB argmax never ties and the tie-break RNGs never matter) and
the SAME JAX engine as env (whose parity against the compiled reference
go_env.so is proven in test_vs_reference.py). After every round we compare
root visits / per-action child visits / value sums / ons / priors exactly.

Documented deviation not covered here: the reference retries terminal
descents up to 2*readouts per run() (failsafe, self_play.py:134-136); the
batched round runs exactly `readouts` descents. The positions tested never
reach terminal states, where the two schedules are identical.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transgo_tpu.config import small_test_config
from transgo_tpu.ops import GoEngine
from transgo_tpu.ops.features import FeatureEncoder
from transgo_tpu.search import MCTS, SearchMode
from transgo_tpu.search.tree import ONS, VISIT, VSUM, VVAR

F32 = np.float32


# ---------------------------------------------------------------------------
# shared deterministic stub eval (identical closed form on both sides)
def make_stub_eval(engine):
    A = engine.spec.num_actions
    n = engine.spec.num_points
    w = jnp.asarray((np.arange(A) * 0.37 % 1.0).astype(np.float32))

    def eval_fn(obs, to_play):
        b = obs.shape[0]
        own = obs[..., :3].sum(-1).reshape(b, n)   # mover's stones
        opp = obs[..., 3:6].sum(-1).reshape(b, n)
        logits = jnp.concatenate(
            [0.9 * w[:-1][None, :] + 0.4 * own - 0.3 * opp,
             jnp.full((b, 1), 0.02, jnp.float32)],
            axis=1,
        )
        policy = jax.nn.softmax(logits, axis=-1)
        value = jnp.tanh(0.3 * (own.sum(1) - opp.sum(1)) + 0.05)
        return policy, value

    return eval_fn


# ---------------------------------------------------------------------------
# host-side single-board env view over the (reference-parity-proven) engine
class HostEnv:
    def __init__(self, engine: GoEngine):
        self.engine = engine
        self.n = engine.spec.num_points
        self._step = jax.jit(engine.step)
        self._legal = jax.jit(engine.legal_action_mask)
        self._winner = jax.jit(engine.winner)
        self.encoder = FeatureEncoder(engine, 10)
        self._obs = jax.jit(lambda s: self.encoder(s))

    def reset(self):
        return self.engine.init(1)

    def step(self, state, action):
        s, done = self._step(state, jnp.array([action], jnp.int32))
        return s, bool(done[0])

    def legal_actions(self, state):
        return [int(a) for a in np.nonzero(np.asarray(self._legal(state))[0])[0]]

    def player(self, state):
        return int(state.next_player[0])

    def winner(self, state):
        return int(self._winner(state)[0])

    def obs(self, state):
        return self._obs(state)


# ---------------------------------------------------------------------------
class RefNode:
    __slots__ = ("prior", "state", "n", "vs", "ons", "vmean", "vvar",
                 "children", "real_expanded")

    def __init__(self, prior):
        self.prior = F32(prior)
        self.state = None
        self.n = 0
        self.vs = F32(0.0)
        self.ons = 0.0
        self.vmean = F32(0.0)
        self.vvar = F32(0.0)
        self.children = {}
        self.real_expanded = False

    def value(self):
        return F32(self.vs / F32(self.n + 1))

    def expand(self, action_priors, value=0.0):
        for a, p in action_priors.items():
            c = RefNode(p)
            c.vs = F32(-value)
            self.children[a] = c


class RefSearch:
    """Single-tree host search with the reference's exact update rules."""

    def __init__(self, mode: str, env: HostEnv, eval_fn, cfg):
        self.mode = mode
        self.env = env
        self.eval_fn = eval_fn
        self.L = cfg.parallel_readouts
        self.c = F32(cfg.c_puct)
        self.c1 = F32(cfg.c_puct1)
        self.c2 = F32(cfg.c_puct2)
        self.wu_loss = cfg.wu_loss
        self.virtual_loss = F32(cfg.virtual_loss)

    def evaluate(self, state):
        p, v = self.eval_fn(self.env.obs(state), state.next_player)
        return np.asarray(p)[0], F32(np.asarray(v)[0])

    def reset_root(self, state):
        self.root = RefNode(0.0)
        self.root.state = state
        policy, value = self.evaluate(state)
        legal = self.env.legal_actions(state)
        # RAW priors at root (self_play.py:600-605)
        self.root.expand({a: policy[a] for a in legal}, value)
        self.root.real_expanded = True

    # -- scoring -----------------------------------------------------------
    def ucb(self, parent, child):
        if self.mode == "classic":
            ps = self.c * child.prior * F32(
                np.sqrt(F32(parent.n))
            ) / F32(child.n + 1)
            return F32(ps - child.value())
        ps = child.prior * F32(
            np.sqrt(F32(parent.n + parent.ons))
        ) / F32(child.n + child.ons + 1)
        if self.mode == "wu":
            return F32(self.c * ps - child.value())
        var = F32(np.clip(child.vvar, 0.0, 3.0))
        return F32(
            self.c1 * ps + self.c2 * F32(np.sqrt(F32(1.0 + var)))
            - child.value()
        )

    def select_child(self, node):
        scores = {a: self.ucb(node, c) for a, c in node.children.items()}
        best = max(scores.values())
        # ties DO occur by design: a fresh node's children share the value
        # seed and the prior term is zero while parent.n (+ ons) == 0, so
        # the first selection ties across every child. The reference breaks
        # ties uniformly at random (self_play.py:708-714); both sides here
        # use the deterministic lowest-index rule (deterministic_tie_break)
        # so the RNGs never have to agree.
        a = min(a for a, s in scores.items() if s == best)
        return a, node.children[a]

    # -- updates -----------------------------------------------------------
    def backpropagate(self, path, value):
        value = F32(value)
        for node in reversed(path):
            node.vs = F32(node.vs + value)
            node.n += 1
            if self.mode == "wp":  # Node_V.value_mean_var
                t = node.vmean
                node.vmean = node.value()
                node.vvar = F32(node.vvar + (value - t) * (value - node.vmean))
            value = F32(-value)

    def mark(self, path, sign):
        for node in reversed(path):
            if self.mode == "classic":
                node.vs = F32(node.vs + sign * self.virtual_loss)
            else:
                node.ons += sign * self.wu_loss

    def complete(self, policy, value, path, leaf_state):
        leaf = path[-1]
        if leaf.real_expanded:
            if self.mode == "wu":
                return  # ons leak: no revert, no backprop (self_play.py:246-253)
            return      # wp/classic reverted unconditionally by run()
        legal = self.env.legal_actions(leaf_state)
        scale = F32(sum(policy[a] for a in legal))
        if scale > 0:
            for a in legal:
                leaf.children[a].prior = F32(policy[a] / scale)
                leaf.children[a].vs = F32(-value)
        leaf.real_expanded = True
        if self.mode == "wu":
            self.mark(path, -1)  # revert inside complete (self_play.py:255)
        self.backpropagate(path, value)

    # -- one run() ----------------------------------------------------------
    def run(self):
        paths, leaves = [], []
        failsafe = 0
        while len(paths) < self.L and failsafe < self.L * 2:
            node = self.root
            path = [node]
            failsafe += 1
            while node.real_expanded:
                action, node = self.select_child(node)
                path.append(node)
            leaf_state, done = self.env.step(path[-2].state, action)
            node.state = leaf_state
            if not done:
                node.expand({a: 0.0 for a in self.env.legal_actions(leaf_state)})
            else:
                v = 1.0 if self.env.player(leaf_state) == self.env.winner(
                    leaf_state) else -1.0
                self.backpropagate(path, v)
                continue
            self.mark(path, +1)
            paths.append(path)
            leaves.append(leaf_state)
        if paths:
            for path, leaf_state in zip(paths, leaves):
                policy, value = self.evaluate(leaf_state)
                if self.mode != "wu":
                    self.mark(path, -1)  # unconditional revert
                self.complete(policy, value, path, leaf_state)

    def update_with_action(self, action):
        next_state, _ = self.env.step(self.root.state, action)
        self.root = self.root.children[action]
        if not self.root.real_expanded:
            self.root.state = next_state
            policy, value = self.evaluate(next_state)
            legal = self.env.legal_actions(next_state)
            self.root.expand({a: policy[a] for a in legal}, value)
            self.root.real_expanded = True
        else:
            self.root.state = next_state

    # -- inspection ---------------------------------------------------------
    def root_child_arrays(self, num_actions):
        visits = np.zeros(num_actions, np.int64)
        vs = np.zeros(num_actions, F32)
        ons = np.zeros(num_actions, F32)
        prior = np.zeros(num_actions, F32)
        for a, c in self.root.children.items():
            visits[a] = c.n
            vs[a] = c.vs
            ons[a] = c.ons
            prior[a] = c.prior
        return visits, vs, ons, prior


# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def batched(mode):
    cfg = small_test_config(
        num_simulation=24, parallel_readouts=2, c_puct=3.0,
        c_puct1=3.0, c_puct2=0.05, wu_loss=2, virtual_loss=3.0,
        deterministic_tie_break=True,
    )
    eng = GoEngine(5, komi=2.5, max_step=30)
    mcts = MCTS(cfg, eng, SearchMode(mode))
    ev = make_stub_eval(eng)
    round_j = jax.jit(
        lambda t, k: mcts.run_round(t, ev, k, jnp.ones((1,), bool))
    )
    adv_j = jax.jit(lambda t, a: mcts.advance(t, a, ev))
    return cfg, eng, mcts, ev, round_j, adv_j


def _compare_roots(tree, fix, mcts, round_i, mode):
    bar = np.arange(1)
    root = np.asarray(tree.root)
    stats = np.asarray(tree.stats)[0]
    root_stats = stats[root[0]]
    ctx = f"mode={mode} round={round_i}"

    assert int(root_stats[VISIT]) == fix.root.n, f"{ctx}: root visits"
    assert root_stats[VSUM] == pytest.approx(fix.root.vs, abs=1e-4), (
        f"{ctx}: root value_sum"
    )
    assert root_stats[ONS] == pytest.approx(fix.root.ons), f"{ctx}: root ons"

    counts, _ = mcts.action_statistics(tree)
    A = counts.shape[1]
    f_vis, f_vs, f_ons, f_prior = fix.root_child_arrays(A)
    # action_statistics applies the ==1 zeroing; compare raw child rows
    edge_child = np.asarray(tree.edge_child)[0, root[0]]
    prior_row = np.asarray(tree.edge_prior)[0, root[0]]
    legal_row = np.asarray(tree.legal)[0, root[0]]
    for a in range(A):
        if not legal_row[a]:
            assert f_vis[a] == 0
            continue
        ch = edge_child[a]
        if ch >= 0:
            assert int(stats[ch, VISIT]) == f_vis[a], (
                f"{ctx}: visits of child {a}"
            )
            assert stats[ch, VSUM] == pytest.approx(f_vs[a], abs=1e-4), (
                f"{ctx}: value_sum of child {a}"
            )
            assert stats[ch, ONS] == pytest.approx(f_ons[a]), (
                f"{ctx}: ons of child {a}"
            )
            if mode == "wp":
                assert stats[ch, VVAR] == pytest.approx(
                    fix.root.children[a].vvar, abs=1e-4
                ), f"{ctx}: value_var of child {a}"
        else:
            assert f_vis[a] == 0, f"{ctx}: unallocated child {a} has visits"
        assert prior_row[a] == pytest.approx(f_prior[a], abs=1e-5), (
            f"{ctx}: prior of child {a}"
        )


@pytest.mark.parametrize("mode", ["classic", "wu", "wp"])
def test_golden_search_round_parity(mode):
    cfg, eng, mcts, ev, round_j, adv_j = batched(mode)
    env = HostEnv(eng)
    fix = RefSearch(mode, env, ev, cfg)
    fix.reset_root(env.reset())

    tree = mcts.reset_root(mcts.new_tree(1), ev)
    key = jax.random.PRNGKey(0)
    for r in range(8):
        tree = round_j(tree, jax.random.fold_in(key, r))
        fix.run()
        _compare_roots(tree, fix, mcts, r, mode)

    # pi with the ==1 zeroing (self_play.py:668-671)
    counts, pi = mcts.action_statistics(tree)
    f_vis, _, _, _ = fix.root_child_arrays(counts.shape[1])
    f_counts = np.where(f_vis == 1, 0, f_vis)
    assert np.array_equal(np.asarray(counts)[0], f_counts)
    assert np.asarray(pi)[0] == pytest.approx(
        f_counts / max(1, f_counts.sum()), abs=1e-6
    )

    # tree reuse: play the most-visited action on both, then more rounds
    action = int(f_counts.argmax())
    tree, _ = adv_j(tree, jnp.array([action], jnp.int32))
    fix.update_with_action(action)
    for r in range(8, 12):
        tree = round_j(tree, jax.random.fold_in(key, r))
        fix.run()
        _compare_roots(tree, fix, mcts, r, mode)


def test_golden_wu_ons_leak():
    """Force duplicate leaf selection and assert the batched WU engine
    reproduces the reference's ons leak while WP reverts fully."""
    for mode, leak in [("wu", True), ("wp", False)]:
        cfg, eng, mcts, ev, round_j, _ = batched(mode)
        env = HostEnv(eng)
        fix = RefSearch(mode, env, ev, cfg)
        fix.reset_root(env.reset())
        tree = mcts.reset_root(mcts.new_tree(1), ev)
        key = jax.random.PRNGKey(3)
        total_ons = 0.0
        for r in range(10):
            tree = round_j(tree, jax.random.fold_in(key, r))
            fix.run()
            _compare_roots(tree, fix, mcts, r, mode)
            total_ons += float(np.asarray(tree.stats)[0, :, ONS].sum())
        stats = np.asarray(tree.stats)[0]
        residual = stats[:, ONS].sum()
        assert residual == pytest.approx(
            sum(c.ons for c in _all_nodes(fix.root)), abs=1e-5
        )
        if not leak:
            assert residual == 0.0, "WP must revert all ons"


def _all_nodes(node):
    yield node
    for c in node.children.values():
        yield from _all_nodes(c)
