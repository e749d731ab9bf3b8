"""Network zoo: TPU-native ports of the reference's PyTorch models.

Architecture parity with /root/reference/model.py:

- :class:`MainNetwork`   — model.py:41-114: CNN stem, 9 ResNet-V2 blocks with
  self-attention at positions 3/7/12, shared value+ownership head, attention
  policy head. This is the flagship 9x9 net (``TransGoNetwork`` wrapper,
  model.py:11-27).
- :class:`MiniNetwork`   — the working 7x7 sub-model
  (scale_train/scale_train_bound/model.py:146-201 ``Network``; the root-repo
  ``MiniNetwork`` at model.py:148-203 has a broken ``super()`` call and is
  never constructible — do-not-replicate list, SURVEY.md section 7).
- :class:`AlphaZeroNetwork` — the 2-head comparison net (model.py:423-488).

TPU-native design decisions (deliberate deviations, functionally equivalent):

- NHWC layout (channels on the 128-lane minor dim) instead of NCHW;
- configurable compute dtype (bfloat16 on TPU) with float32 params and
  float32 head outputs;
- the policy head returns *log*-probabilities (numerically-stable
  log_softmax); the reference returns softmax probabilities
  (model.py:111). Consumers exponentiate where needed.

Self-attention reproduces the reference's SAGAN-style mixing exactly,
including its unusual normalization axis: ``out_i = sum_j v_j * a[j, i]``
where ``a[j, :]`` is softmax-normalized (model.py:301-315 — softmax over the
last dim of ``energy`` followed by ``bmm(value, attention)``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class CNNBlock(nn.Module):
    """Conv3x3 + BatchNorm + ReLU (model.py:317-324)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    """Pre-activation (ResNet-V2) residual block, no resampling
    (model.py:208-260, the ``resample=None`` paths). When the channel count
    changes, the shortcut is a 1x1 conv on the raw input (model.py:250-260).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        if in_features == self.features:
            shortcut = x
        else:
            shortcut = nn.Conv(
                self.features, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        y = nn.relu(y)
        y = nn.Conv(in_features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(y)
        return shortcut + y


class SelfAttention(nn.Module):
    """Board self-attention over H*W tokens (model.py:288-315).

    ``qk_divisor`` is 4 for the main net (model.py:294) and 8 for the
    scale_train nets (scale_train_bound/model.py:124). ``post_bn`` matches
    the main net's trailing BN+ReLU (model.py:313); the scale_train variant
    omits it.
    """

    qk_divisor: int = 4
    post_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        q = nn.Conv(c // self.qk_divisor, (1, 1), dtype=self.dtype,
                    name="query")(x).reshape(b, n, -1)
        k = nn.Conv(c // self.qk_divisor, (1, 1), dtype=self.dtype,
                    name="key")(x).reshape(b, n, -1)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value")(x).reshape(b, n, c)

        # energy[b, i, j] = q_i . k_j ; attention normalized over j
        energy = jnp.einsum("bif,bjf->bij", q, k)
        attention = jax.nn.softmax(energy.astype(jnp.float32), axis=-1)
        attention = attention.astype(self.dtype)
        # reference: out_i = sum_j v_j * attention[j, i]  (model.py:309)
        out = jnp.einsum("bjc,bji->bic", v, attention).reshape(b, h, w, c)

        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        out = gamma.astype(self.dtype) * out + x
        if self.post_bn:
            out = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(out)
            out = nn.relu(out)
        return out


class MainNetwork(nn.Module):
    """The flagship 9x9 policy/value/ownership net (model.py:41-114).

    Returns ``(log_policy [B, n+1], value [B, 1], own [B, n])``.
    """

    board_size: int = 9
    num_features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, s = self.num_features, self.board_size
        x = x.astype(self.dtype)
        x = CNNBlock(f, self.dtype, name="conv1")(x, train)
        # trunk: residual blocks with attention at reference positions
        # 3 / 7 / 12 (model.py:49-62)
        for i, kind in enumerate(
            ["res", "attn", "res", "res", "res", "attn",
             "res", "res", "res", "res", "attn", "res"]
        ):
            if kind == "res":
                x = ResidualBlock(f, self.dtype, name=f"block{i + 2}")(x, train)
            else:
                x = SelfAttention(4, True, self.dtype, name=f"block{i + 2}")(
                    x, train
                )
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn_res_end",
        )(x)
        x = nn.relu(x)

        # ---- value + ownership head (model.py:64-69, 96-102) ----
        vo = CNNBlock(2, self.dtype, name="conv_val_own")(x, train)
        vo = vo.reshape(vo.shape[0], -1)
        vo = nn.relu(nn.Dense(64, dtype=self.dtype, name="fc_val_own")(vo))
        value = jnp.tanh(
            nn.Dense(1, dtype=self.dtype, name="fc_val")(vo)
        ).astype(jnp.float32)
        own = jnp.tanh(
            nn.Dense(s * s, dtype=self.dtype, name="fc_own")(vo)
        ).astype(jnp.float32)

        # ---- policy head (model.py:72-76, 104-111) ----
        p = SelfAttention(4, True, self.dtype, name="attention_act")(x, train)
        p = CNNBlock(4, self.dtype, name="conv_act")(p, train)
        p = p.reshape(p.shape[0], -1)
        logits = nn.Dense(s * s + 1, dtype=self.dtype, name="fc_act")(p)
        log_policy = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return log_policy, value, own


class MiniNetwork(nn.Module):
    """The 7x7 scale-transfer sub-model
    (scale_train/scale_train_bound/model.py:146-201 ``Network``): conv stem,
    4 residual blocks, conv policy head, residual value/own head."""

    board_size: int = 7
    num_features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, s = self.num_features, self.board_size
        x = x.astype(self.dtype)
        x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        for i in range(4):
            x = ResidualBlock(f, self.dtype, name=f"block{i + 2}")(x, train)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(x)

        p = nn.Conv(4, (3, 3), padding="SAME", dtype=self.dtype, name="res_act")(x)
        p = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn3",
        )(p)
        p = nn.relu(p).reshape(p.shape[0], -1)
        logits = nn.Dense(s * s + 1, dtype=self.dtype, name="act_fc1")(p)
        log_policy = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        vo = ResidualBlock(4, self.dtype, name="res_val_own")(x, train)
        vo = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn4",
        )(vo)
        vo = nn.relu(vo).reshape(vo.shape[0], -1)
        vo = nn.relu(nn.Dense(64, dtype=self.dtype, name="val_own_fc1")(vo))
        value = jnp.tanh(
            nn.Dense(1, dtype=self.dtype, name="val_fc1")(vo)
        ).astype(jnp.float32)
        own = jnp.tanh(
            nn.Dense(s * s, dtype=self.dtype, name="own_fc1")(vo)
        ).astype(jnp.float32)
        return log_policy, value, own


class AlphaZeroNetwork(nn.Module):
    """2-head (policy, value) baseline net with attention (model.py:423-488):
    conv stem, 11 trunk blocks with attention at positions 3/7/10."""

    board_size: int = 9
    num_features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, s = self.num_features, self.board_size
        x = x.astype(self.dtype)
        x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        for i, kind in enumerate(
            ["res", "attn", "res", "res", "res", "attn",
             "res", "res", "attn", "res", "res"]
        ):
            if kind == "res":
                x = ResidualBlock(f, self.dtype, name=f"block{i + 2}")(x, train)
            else:
                x = SelfAttention(4, True, self.dtype, name=f"block{i + 2}")(
                    x, train
                )
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(x)

        p = nn.Conv(4, (3, 3), padding="SAME", dtype=self.dtype, name="res_act")(x)
        p = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn3",
        )(p)
        p = nn.relu(p).reshape(p.shape[0], -1)
        logits = nn.Dense(s * s + 1, dtype=self.dtype, name="act_fc1")(p)
        log_policy = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        v = nn.Conv(2, (3, 3), padding="SAME", dtype=self.dtype, name="res_val")(x)
        v = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn4",
        )(v)
        v = nn.relu(v).reshape(v.shape[0], -1)
        v = nn.relu(nn.Dense(64, dtype=self.dtype, name="val_fc1")(v))
        value = jnp.tanh(
            nn.Dense(1, dtype=self.dtype, name="val_fc2")(v)
        ).astype(jnp.float32)
        return log_policy, value


class TransGoNetwork:
    """Convenience bundle: module + init + jitted apply.

    The reference ``TransGoNetwork`` (model.py:11-27) carried
    get_weights/set_weights for Ray weight shipping; in single-program JAX
    the "weights" are just the params pytree.
    """

    def __init__(self, config, kind: str = "main"):
        dtype = jnp.dtype(config.compute_dtype)
        if kind == "main":
            self.module = MainNetwork(
                config.board_size, config.num_features, dtype
            )
            self.size = config.board_size
        elif kind == "mini":
            self.module = MiniNetwork(
                config.local_board_size, config.num_features, dtype
            )
            self.size = config.local_board_size
        elif kind == "alphazero":
            self.module = AlphaZeroNetwork(
                config.board_size, config.num_features, dtype
            )
            self.size = config.board_size
        else:
            raise ValueError(kind)
        # input_dim is the post-init alias of encode_state_channels
        # (reference configure.py:36 keeps both; __post_init__ ties them)
        self.channels = config.input_dim
        self.param_dtype = jnp.dtype(config.param_dtype)
        self.kind = kind

    def init(self, key):
        dummy = jnp.zeros((1, self.size, self.size, self.channels), jnp.float32)
        variables = self.module.init(key, dummy, train=False)
        if self.param_dtype != jnp.float32:
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(self.param_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                variables,
            )
        return variables  # {'params': ..., 'batch_stats': ...}

    def apply(self, variables, obs, train: bool = False):
        """Inference (train=False uses running BN stats, like the
        reference's model.eval() in self-play, self_play.py:892)."""
        return self.module.apply(variables, obs, train=train)

    def apply_train(self, variables, obs):
        """Training forward: returns (outputs, new_batch_stats)."""
        outs, mutated = self.module.apply(
            variables, obs, train=True, mutable=["batch_stats"]
        )
        return outs, mutated["batch_stats"]


def build_network(config, kind: str = "main") -> TransGoNetwork:
    return TransGoNetwork(config, kind)


def count_params(variables) -> int:
    return sum(
        x.size for x in jax.tree_util.tree_leaves(variables.get("params", variables))
    )
