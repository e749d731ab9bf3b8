"""Model-zoo tests: shapes, normalization, determinism, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transgo_tpu.config import Config, small_test_config
from transgo_tpu.models import build_network
from transgo_tpu.models.nets import count_params


def test_main_network_shapes():
    cfg = small_test_config(board_size=9, num_features=32)
    net = build_network(cfg, "main")
    v = net.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((3, 9, 9, 10))
    log_p, val, own = jax.jit(lambda v_, o: net.apply(v_, o))(v, obs)
    assert log_p.shape == (3, 82)
    assert val.shape == (3, 1)
    assert own.shape == (3, 81)
    assert np.allclose(np.exp(np.asarray(log_p)).sum(1), 1.0, atol=1e-4)
    assert (np.abs(np.asarray(val)) <= 1).all()
    assert (np.abs(np.asarray(own)) <= 1).all()


def test_mini_network_shapes():
    cfg = small_test_config(num_features=32)
    net = build_network(cfg, "mini")
    v = net.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((2, 7, 7, 10))
    log_p, val, own = jax.jit(lambda v_, o: net.apply(v_, o))(v, obs)
    assert log_p.shape == (2, 50)
    assert own.shape == (2, 49)


def test_alphazero_two_heads():
    cfg = small_test_config(board_size=9, num_features=32)
    net = build_network(cfg, "alphazero")
    v = net.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((2, 9, 9, 10))
    out = jax.jit(lambda v_, o: net.apply(v_, o))(v, obs)
    assert len(out) == 2


def test_flagship_param_count():
    """Flagship stays in the reference's ~2-3M-param class (model.py:41-114
    with 128 features)."""
    cfg = Config()
    net = build_network(cfg, "main")
    v = net.init(jax.random.PRNGKey(0))
    n = count_params(v)
    assert 2_000_000 < n < 4_000_000, n


def test_batchnorm_modes():
    """train mode mutates batch_stats; eval mode is deterministic."""
    cfg = small_test_config(board_size=5, num_features=16)
    net = build_network(cfg, "main")
    v = net.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 5, 10))
    f = jax.jit(lambda v_, o: net.apply(v_, o))
    out1 = f(v, obs)
    out2 = f(v, obs)
    assert np.allclose(np.asarray(out1[0]), np.asarray(out2[0]))
    (_, _, _), new_stats = net.apply_train(v, obs)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), v["batch_stats"], new_stats
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_gradients_flow():
    cfg = small_test_config(board_size=5, num_features=16)
    net = build_network(cfg, "main")
    v = net.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 10))

    def loss(params):
        lp, val, own = net.module.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, obs,
            train=False,
        )
        return -lp.mean() + (val ** 2).mean() + (own ** 2).mean()

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert np.isfinite(total) and total > 0


def test_extra_blocks_apply():
    """The inventory-parity blocks (reference model.py:327-399, all unused
    by shipped nets) initialize and forward with the expected shapes; the
    noisy layer actually perturbs its mean output when sampled."""
    from transgo_tpu.models.extras import (
        GAPBlock,
        NoisyDense,
        SelfAttentionFusion,
    )

    kq, kk, kv, ki, kn = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(kv, (2, 5, 5, 16))

    fusion = SelfAttentionFusion()
    vf = fusion.init(ki, jax.random.normal(kq, x.shape),
                     jax.random.normal(kk, x.shape), x)
    out = fusion.apply(vf, jax.random.normal(kq, x.shape),
                       jax.random.normal(kk, x.shape), x)
    assert out.shape == x.shape

    gap = GAPBlock(out_units=8)
    vg = gap.init(ki, x)
    assert gap.apply(vg, x).shape == (2, 8)

    noisy = NoisyDense(features=6)
    flat = x.reshape(2, -1)
    vn = noisy.init(ki, flat)
    mean_out = noisy.apply(vn, flat)
    assert mean_out.shape == (2, 6)
    noised = noisy.apply(vn, flat, noisy=True, rng=kn)
    assert not np.allclose(np.asarray(mean_out), np.asarray(noised))
    # eval mode (no rng) is deterministic = mean layer
    assert np.allclose(
        np.asarray(noisy.apply(vn, flat)), np.asarray(mean_out)
    )
