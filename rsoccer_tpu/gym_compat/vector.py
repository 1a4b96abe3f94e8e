"""Gymnasium VectorEnv wrapper over the TPU-batched envs.

The reference has no vector API at all (SURVEY §2: not even
``gymnasium.vector``); this gives gymnasium-ecosystem users (e.g.
vector-env-based training loops) the batched TPU engine behind the standard
``VectorEnv`` interface: numpy in, numpy out.  Auto-reset: the step that
ends an episode returns the *reset* observation (the final pre-reset
observation is not surfaced — rewards/terminations still describe the
ending step, which is what on-policy learners consume).
"""

from __future__ import annotations

from typing import Optional

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

import rsoccer_tpu
from rsoccer_tpu.batch.vecenv import BatchedEnv


class VectorGymnasiumEnv(gym.vector.VectorEnv):
    """numpy-facing vectorised env backed by a jitted batched step."""

    def __init__(self, env_id: str, num_envs: int, **kwargs):
        self.env = rsoccer_tpu.make(env_id, **kwargs)
        self.benv = BatchedEnv(self.env, num_envs)
        self.num_envs = num_envs
        self.single_action_space = gym.spaces.Box(
            low=-1, high=1, shape=(self.env.action_size,), dtype=np.float32
        )
        self.single_observation_space = gym.spaces.Box(
            low=-1.2, high=1.2, shape=(self.env.obs_size,), dtype=np.float32
        )
        self.action_space = gym.vector.utils.batch_space(
            self.single_action_space, num_envs
        )
        self.observation_space = gym.vector.utils.batch_space(
            self.single_observation_space, num_envs
        )
        self._state = None
        self._key = jax.random.PRNGKey(0)
        self._reset_fn = jax.jit(self.benv.reset)
        self._step_fn = jax.jit(self.benv.step)

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._reset_fn(k)
        return np.asarray(obs).T, {}

    def step(self, actions):
        actions = jnp.asarray(actions, jnp.float32).T  # (A, B) lane layout
        self._key, k = jax.random.split(self._key)
        self._state, obs, reward, term, trunc, info = self._step_fn(
            self._state, actions, k
        )
        return (
            np.asarray(obs).T,
            np.asarray(reward),
            np.asarray(term),
            np.asarray(trunc),
            {k_: np.asarray(v) for k_, v in info.items()},
        )

    def close_extras(self, **kwargs):
        pass
