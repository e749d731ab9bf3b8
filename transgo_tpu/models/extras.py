"""Auxiliary model blocks kept for component-inventory parity.

The reference carries three building blocks that no shipped network uses
(model.py:327-399, SURVEY.md section 2.2 "Extra model utils"); they exist so
experiments can be wired without new code. Same here, in Flax:

- :class:`SelfAttentionFusion` — cross-attention mixing separate
  query/key/value feature maps (Self_Attention_Fusion, model.py:327-349);
- :class:`GAPBlock` — conv + global average pooling head replacement
  (model.py:351-359);
- :class:`NoisyDense` — factorized-Gaussian noisy linear layer for
  parameter-space exploration (NoisyLinear, model.py:361-399).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class SelfAttentionFusion(nn.Module):
    """Cross-attention over H*W tokens: queries from one map, keys from a
    second, values from a third (model.py:338-349; same unusual mixing axis
    as the in-trunk attention)."""

    qk_divisor: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_query, x_key, x_value):
        b, h, w, c = x_value.shape
        n = h * w
        q = nn.Conv(c // self.qk_divisor, (1, 1), dtype=self.dtype,
                    name="query")(x_query).reshape(b, n, -1)
        k = nn.Conv(c // self.qk_divisor, (1, 1), dtype=self.dtype,
                    name="key")(x_key).reshape(b, n, -1)
        v = nn.Conv(c, (1, 1), dtype=self.dtype,
                    name="value")(x_value).reshape(b, n, c)
        energy = jnp.einsum("bif,bjf->bij", q, k)
        attention = jax.nn.softmax(energy.astype(jnp.float32), axis=-1)
        out = jnp.einsum(
            "bjc,bji->bic", v, attention.astype(self.dtype)
        )
        return out.reshape(b, h, w, c)


class GAPBlock(nn.Module):
    """Conv3x3 + global average pool (model.py:351-359) — a fully-connected
    head replacement."""

    out_units: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_units, (3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        return jnp.mean(x, axis=(1, 2))


class NoisyDense(nn.Module):
    """Factorized-Gaussian noisy linear layer (NoisyLinear,
    model.py:361-399): w = mu + sigma * (eps_out x eps_in) with
    sign(x)*sqrt(|x|) scaling. Pass ``rng`` and ``noisy=True`` to sample;
    otherwise behaves as the mean layer (reference eval mode)."""

    features: int
    std_init: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, noisy: bool = False, rng=None):
        in_features = x.shape[-1]
        mu_range = 1.0 / jnp.sqrt(in_features)
        w_mu = self.param(
            "w_mu", nn.initializers.uniform(scale=2 * mu_range),
            (in_features, self.features),
        ) - mu_range
        w_sigma = self.param(
            "w_sigma",
            nn.initializers.constant(self.std_init / in_features ** 0.5),
            (in_features, self.features),
        )
        b_mu = self.param(
            "b_mu", nn.initializers.uniform(scale=2 * mu_range),
            (self.features,),
        ) - mu_range
        b_sigma = self.param(
            "b_sigma",
            nn.initializers.constant(self.std_init / self.features ** 0.5),
            (self.features,),
        )
        if noisy and rng is not None:
            def scale_noise(k, size):
                z = jax.random.normal(k, (size,))
                return jnp.sign(z) * jnp.sqrt(jnp.abs(z))

            k_in, k_out = jax.random.split(rng)
            eps_in = scale_noise(k_in, in_features)
            eps_out = scale_noise(k_out, self.features)
            w = w_mu + w_sigma * jnp.outer(eps_in, eps_out)
            b = b_mu + b_sigma * eps_out
        else:
            w, b = w_mu, b_mu
        return x.astype(self.dtype) @ w.astype(self.dtype) + b.astype(
            self.dtype
        )
