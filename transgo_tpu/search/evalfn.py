"""Evaluation-function builders: network apply + optional value transforms.

Centralizes the leaf-evaluation closures passed into the search:

- plain policy/value (policyValueFn, self_play.py:296-311);
- ownership-blended value used by both scale_train recipes:
  ``v = (1-b)*v_net + b*tanh(tanh_norm*(sum(own) + komi_signed))`` with komi
  positive for the white mover (scale_train_live/self_play.py:176-185;
  b = 0.1, tanh_norm = 0.45);
- the WP scale-transfer mix lives in transgo_tpu/curriculum/transfer.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from transgo_tpu.ops.state import WHITE


def make_eval_fn(network, variables, komi: float = 7.5,
                 own_blend: float = 0.0, tanh_norm: float = 0.45):
    """Build an EvalFn(obs, to_play) from a network + variables."""

    def eval_fn(obs, to_play):
        out = network.apply(variables, obs, train=False)
        log_p, value = out[0], out[1][:, 0]
        policy = jnp.exp(log_p)
        if own_blend > 0.0 and len(out) > 2:
            own = out[2]
            komi_signed = jnp.where(to_play == WHITE, komi, -komi)
            v2 = jnp.tanh(tanh_norm * (own.sum(axis=-1) + komi_signed))
            value = (1.0 - own_blend) * value + own_blend * v2
        return policy, value

    return eval_fn
