"""Actor-critic networks for the on-TPU RL stack.

The reference is env-only ("optimized for RL experiments", README.md:10-28,
but ships no agents); a complete TPU framework pairs the batched envs with a
learner whose matmuls ride the MXU.  Networks are flax MLPs; compute dtype is
configurable (bfloat16 by default for MXU throughput, fp32 params).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ActorCritic(nn.Module):
    """Gaussian-policy actor + value critic with separate torsos."""

    action_size: int
    hidden: Sequence[int] = (256, 256)
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        """obs (B, O) -> (mean (B, A), log_std (A,), value (B,))."""
        # orthogonal init, sqrt(2) hidden / 0.01 policy head / 1.0 value
        # head — the standard PPO continuous-control recipe (small initial
        # policy outputs keep early updates near the shaping gradient)
        hidden_init = nn.initializers.orthogonal(jnp.sqrt(2.0))
        x = obs.astype(self.compute_dtype)
        a = x
        for i, h in enumerate(self.hidden):
            a = nn.Dense(
                h, name=f"actor_{i}", dtype=self.compute_dtype,
                kernel_init=hidden_init,
            )(a)
            a = nn.tanh(a)
        mean = nn.Dense(
            self.action_size, name="actor_out", dtype=jnp.float32,
            kernel_init=nn.initializers.orthogonal(0.01),
        )(a.astype(jnp.float32))
        log_std = self.param(
            "log_std", nn.initializers.zeros, (self.action_size,)
        )

        v = x
        for i, h in enumerate(self.hidden):
            v = nn.Dense(
                h, name=f"critic_{i}", dtype=self.compute_dtype,
                kernel_init=hidden_init,
            )(v)
            v = nn.tanh(v)
        value = nn.Dense(
            1, name="critic_out", dtype=jnp.float32,
            kernel_init=nn.initializers.orthogonal(1.0),
        )(v.astype(jnp.float32))[..., 0]
        return mean, log_std, value


def sample_action(key, mean, log_std):
    """Gaussian sample + log-prob. Shapes: mean (B, A) -> action (B, A)."""
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape)
    action = mean + std * noise
    logp = gaussian_logp(action, mean, log_std)
    return action, logp


def gaussian_logp(action, mean, log_std):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(
        -0.5 * z * z - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1
    )


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e))
