"""Actor-learner runtime: replay, train step, self-play actor, pipeline.

Replaces the reference's Ray actor soup (transgo.py, trainer.py,
replay_buffer.py, shared_storage.py) with one JAX program + a host-side
control loop.
"""

from transgo_tpu.runtime.replay import ReplayBuffer  # noqa: F401
from transgo_tpu.runtime.learner import Learner, TrainState  # noqa: F401
from transgo_tpu.runtime.actor import SelfPlayActor  # noqa: F401
from transgo_tpu.runtime.pipeline import TrainPipeline  # noqa: F401
