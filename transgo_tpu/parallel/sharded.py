"""shard_map'd training and self-play over the device mesh.

This is the TPU-native replacement for the whole reference distributed
runtime (SURVEY.md section 2.3 mapping table):

- gradient data-parallelism: the learner batch is split over the ``data``
  axis, per-shard gradients are ``psum``-averaged over ICI inside the jitted
  step (vs the reference's vestigial single-process torch DataParallel,
  model.py:122);
- actor data-parallelism: the self-play game batch is sharded over the same
  axis; shards never communicate (games are independent), so self-play
  scales linearly — the reference used 6 Ray processes polling a weight
  store (transgo.py:92-101, self_play.py:913);
- weight broadcast is free: params are replicated mesh-wide and the learner
  update runs identically on every shard (grads are psum'd), so actors
  always read fresh weights without any transfer.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transgo_tpu.runtime.learner import Learner, TrainState


class ShardedLearner:
    """Data-parallel train step over a mesh ``data`` axis."""

    def __init__(self, learner: Learner, mesh: Mesh, axis: str = "data"):
        self.learner = learner
        self.mesh = mesh
        self.axis = axis

        state_spec = P()       # replicated
        batch_spec = P(axis)   # batch-sharded
        scalar_spec = P()

        def step(state: TrainState, batch, lr):
            new_state, metrics = learner.grads_psum_train_step(
                state, batch, lr, axis_name=axis
            )
            return new_state, metrics

        self._step = jax.jit(
            jax.shard_map(
                step,
                mesh=mesh,
                in_specs=(state_spec, batch_spec, scalar_spec),
                out_specs=(state_spec, scalar_spec),
                check_vma=False,
            )
        )

    def train_step(self, state: TrainState, batch, lr):
        """batch: host or device arrays with leading dim divisible by the
        data-axis size."""
        sharding = NamedSharding(self.mesh, P(self.axis))
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), batch
        )
        return self._step(state, batch, jnp.asarray(lr, jnp.float32))


def sharded_selfplay_step(actor, mesh: Mesh, axis: str = "data"):
    """Build a jitted self-play move tick whose game batch is sharded over
    the mesh ``data`` axis. Game independence means no collectives — XLA
    partitions the whole step 1:1 onto chips. Each shard folds its mesh
    position into the PRNG key so search noise decorrelates across chips.

    The returned callable needs example (state, variables) pytrees up front
    to derive per-leaf specs (batch-dim leaves shard, scalars/keys
    replicate).
    """
    from transgo_tpu.parallel.mesh import batch_partition_spec

    def build(example_state, example_variables):
        def play(state, variables):
            state = state.replace(
                rng=jax.random.fold_in(
                    state.rng, jax.lax.axis_index(axis)
                )
            )
            return actor.play_move(state, variables)

        state_spec = batch_partition_spec(mesh, example_state, axis)
        var_spec = jax.tree_util.tree_map(lambda _: P(), example_variables)
        # probe output structure for specs (play_move, not play: axis_index
        # is only defined inside the shard_map)
        out_shapes = jax.eval_shape(
            actor.play_move, example_state, example_variables
        )
        out_spec = tuple(
            batch_partition_spec(mesh, o, axis) for o in out_shapes
        )
        return jax.jit(
            jax.shard_map(
                play,
                mesh=mesh,
                in_specs=(state_spec, var_spec),
                out_specs=out_spec,
                check_vma=False,
            )
        )

    return build
