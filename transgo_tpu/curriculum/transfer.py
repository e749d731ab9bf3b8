"""WP-MCTS low-scale -> high-scale transfer: mixing the 7x7 sub-model into
the 9x9 leaf evaluation.

Re-implements WP_MCTS.computeValuePolicy's transfer branch
(self_play.py:796-829) and sub_to_global_encode (self_play.py:832-854):

- the 10-plane 9x9 observation is cut into 4 overlapping 7x7 quadrant crops
  (env.subEncode -> ops.features.sub_encode);
- the sub-model's per-quadrant ownership maps are stitched back to 9x9 with
  halved overlap seams; transfer value = tanh(tanh_norm * (sum own +
  komi_signed)) with komi positive for the white mover (self_play.py:802,
  811-815);
- per-quadrant policies (pass column dropped) are stitched the same way,
  a tiny pass probability appended, sharpened at temperature 0.45 and
  renormalized (self_play.py:817-825). The reference normalizes by the
  batch-total sum (np.sum with no axis, self_play.py:825) — an evident bug
  that shrinks every row by the batch size; we normalize per row.
- both are blended with weight gamma = value_ratio_by_frame(train_step)
  while train_step <= 3500 (self_play.py:803-804; configure.py:82-86).

The reference's transfer branch was actually unreachable (it calls the
nonexistent ``self.policy_value_fn``, self_play.py:809 — do-not-replicate
list); this is the working realization of the documented intent.
"""

from __future__ import annotations

import jax.numpy as jnp

from transgo_tpu.ops.features import sub_encode, sub_to_global
from transgo_tpu.ops.state import WHITE


def make_transfer_eval_fn(config, main_network, main_vars, sub_network,
                          sub_vars, gamma):
    """Build an EvalFn(obs, to_play) mixing sub-model guidance with weight
    ``gamma`` (pass gamma=0.0 to disable; caller applies the <=3500-step
    window, self_play.py:803)."""
    s = config.board_size
    ls = config.local_board_size
    t_pol = config.transfer_policy_temperature
    pass_p = config.transfer_pass_prob

    def eval_fn(obs, to_play):
        log_p, value, _own = main_network.apply(main_vars, obs, train=False)
        policy = jnp.exp(log_p)
        value = value[:, 0]

        n = obs.shape[0]
        crops = sub_encode(obs, ls, 4)                  # [N, 4, ls, ls, C]
        flat = crops.reshape((n * 4,) + crops.shape[2:])
        sub_logp, _sub_v, sub_own = sub_network.apply(
            sub_vars, flat, train=False
        )

        # ---- transfer value from stitched ownership ----
        own_maps = sub_own.reshape(n, 4, ls * ls)
        global_own = sub_to_global(own_maps, s, ls)      # [N, s, s]
        komi_signed = jnp.where(to_play == WHITE, config.komi, -config.komi)
        trans_value = jnp.tanh(
            config.tanh_norm * (global_own.sum(axis=(1, 2)) + komi_signed)
        )

        # ---- transfer policy from stitched quadrant policies ----
        sub_policy = jnp.exp(sub_logp)[:, :-1].reshape(n, 4, ls * ls)
        global_policy = sub_to_global(sub_policy, s, ls).reshape(n, s * s)
        global_policy = jnp.concatenate(
            [global_policy, jnp.full((n, 1), pass_p)], axis=1
        )
        sharp = jnp.power(jnp.maximum(global_policy, 1e-30), 1.0 / t_pol)
        trans_policy = sharp / sharp.sum(axis=1, keepdims=True)

        value = (1.0 - gamma) * value + gamma * trans_value
        policy = (1.0 - gamma) * policy + gamma * trans_policy
        return policy, value

    return eval_fn
