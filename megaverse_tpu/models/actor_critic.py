"""Policy / value networks for RL training.

Matches the reference training setup (megaverse_rl/megaverse_params.py:4-21:
encoder_type=conv, encoder_subtype=convnet_simple, hidden_size=512,
obs_scale=255) — Sample Factory's "convnet_simple" is conv(32,8x8,s4) ->
conv(64,4x4,s2) -> conv(128,3x3,s2) -> FC(512), and the README training
command uses a recurrent core with rollout/recurrence 32 (README.md:134).

The action space is the reference Tuple(3,3,3,2,2,3) (env.cpp:33), modeled as
six independent categorical heads.

TPU notes: convolutions/matmuls run in bfloat16 on the MXU with float32
accumulation; parameters stay float32.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from megaverse_tpu import constants as C

ACTION_HEADS: Tuple[int, ...] = C.ACTION_SPACE_SIZES  # (3, 3, 3, 2, 2, 3)


class ConvEncoder(nn.Module):
    """Sample Factory convnet_simple: 32x8s4, 64x4s2, 128x3s2 -> FC(hidden)."""

    hidden_size: int = 512
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        # obs: uint8 [..., H, W, 3] or packed-RGB int32 [..., H, W]
        if obs.dtype in (jnp.int32, jnp.uint32):
            obs = jnp.stack(
                [(obs >> 16) & 0xFF, (obs >> 8) & 0xFF, obs & 0xFF], axis=-1)
        x = obs.astype(self.dtype) / jnp.asarray(255.0, self.dtype)
        batch_shape = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        for features, kernel, stride in ((32, 8, 4), (64, 4, 2), (128, 3, 2)):
            x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                        padding="VALID", dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.hidden_size, dtype=self.dtype)(x)
        x = nn.relu(x)
        return x.reshape(batch_shape + (self.hidden_size,)).astype(jnp.float32)


class ActorCritic(nn.Module):
    """Conv encoder + optional stacked-GRU core + 6 categorical heads + value
    head. rnn_num_layers matches the reference training commands
    (megaverse_rl/runs/*.py: --rnn_num_layers=2); the carry of all layers is
    packed into one [..., layers*hidden] tensor so callers treat it opaquely."""

    hidden_size: int = 512
    use_rnn: bool = True
    rnn_num_layers: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = ConvEncoder(self.hidden_size, self.dtype)
        if self.use_rnn:
            self.core = [nn.GRUCell(features=self.hidden_size)
                         for _ in range(self.rnn_num_layers)]
        self.action_heads = [nn.Dense(n) for n in ACTION_HEADS]
        self.value_head = nn.Dense(1)

    @property
    def carry_size(self) -> int:
        return self.hidden_size * (self.rnn_num_layers if self.use_rnn else 1)

    def initial_carry(self, batch_shape: Tuple[int, ...]) -> jax.Array:
        return jnp.zeros(batch_shape + (self.carry_size,), jnp.float32)

    def __call__(self, obs: jax.Array, carry: Optional[jax.Array] = None):
        """obs [..., H, W, 3] u8 -> (logits tuple, value [...], new_carry)."""
        x = self.encoder(obs)
        if self.use_rnn:
            if carry is None:
                carry = self.initial_carry(x.shape[:-1])
            h = self.hidden_size
            new_layers = []
            for li, cell in enumerate(self.core):
                c, x = cell(carry[..., li * h:(li + 1) * h], x)
                new_layers.append(c)
            carry = jnp.concatenate(new_layers, axis=-1)
        logits = tuple(head(x) for head in self.action_heads)
        value = self.value_head(x)[..., 0]
        return logits, value, carry


def sample_actions(
    logits: Sequence[jax.Array], key: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Sample multidiscrete actions; returns (actions [..., 6], logp [...])."""
    keys = jax.random.split(key, len(logits))
    acts = []
    logp = 0.0
    for k, lg in zip(keys, logits):
        a = jax.random.categorical(k, lg)
        lp = jnp.take_along_axis(jax.nn.log_softmax(lg), a[..., None], axis=-1)[..., 0]
        acts.append(a)
        logp = logp + lp
    return jnp.stack(acts, axis=-1), logp


def action_log_prob_entropy(logits: Sequence[jax.Array], actions: jax.Array):
    """(logp [...], entropy [...]) for multidiscrete actions [..., 6]."""
    logp = 0.0
    ent = 0.0
    for i, lg in enumerate(logits):
        ls = jax.nn.log_softmax(lg)
        logp = logp + jnp.take_along_axis(ls, actions[..., i][..., None], axis=-1)[..., 0]
        p = jnp.exp(ls)
        ent = ent - jnp.sum(p * ls, axis=-1)
    return logp, ent


def symmetric_kl_from_uniform(logits: Sequence[jax.Array]) -> jax.Array:
    """Sample Factory's symmetric_kl exploration loss
    (megaverse_params.py:16-17): sym KL between the policy and uniform."""
    total = 0.0
    for lg in logits:
        n = lg.shape[-1]
        ls = jax.nn.log_softmax(lg)
        p = jnp.exp(ls)
        log_u = -jnp.log(jnp.asarray(n, jnp.float32))
        kl_pu = jnp.sum(p * (ls - log_u), axis=-1)
        kl_up = jnp.sum(jnp.exp(log_u) * (log_u - ls), axis=-1)
        total = total + kl_pu + kl_up
    return total
