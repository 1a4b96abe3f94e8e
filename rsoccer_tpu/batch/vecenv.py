"""Batched (vmapped) environments.

The reference has no batching of any kind — one env instance drives one C++
simulator synchronously (Simulators/rsim.py:25-33, vss_gym_base.py:72-90).
Here the batch is the TPU parallel axis: single-env pure functions are
vmapped over a *trailing* batch dimension ("lane layout"), which puts the env
index in the TPU's 128-wide lane dimension so all per-entity arrays tile
densely — e.g. robot state becomes ``(n_robots, B)`` instead of
``(B, n_robots)``, avoiding a ~20x lane-padding blowup for small n_robots.

``BatchedEnv.step`` therefore takes/returns:
    state  — pytree, every leaf with a trailing batch axis
    obs    — ``(obs_size, B)``
    action — ``(action_size, B)``
    keys   — ``(2, B)`` uint32, one PRNG key per env (lane layout too: a
             batch-first ``(B, 2)`` key array would put 2 in the TPU lane
             dimension and waste 126/128 lanes on every threefry op)

Use ``obs.T`` / ``actions.T`` at the API edge when batch-first is needed;
inside a rollout loop everything stays lane-layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rsoccer_tpu.envs.base import Env


def make_keys(key, n: int):
    """Split one key into a lane-layout (2, n) per-env key array."""
    return jax.random.split(key, n).T


def split_keys(keys):
    """(2, B) -> ((2, B), (2, B)) one split per env, lane layout."""
    ks = jax.vmap(jax.random.split, in_axes=-1, out_axes=-1)(keys)
    return ks[0], ks[1]


class BatchedEnv:
    """vmap wrapper around a single-env :class:`Env`."""

    def __init__(self, env: Env, n_envs: int):
        self.env = env
        self.n_envs = n_envs
        self.obs_size = env.obs_size
        self.action_size = env.action_size
        self._reset_v = jax.vmap(env.reset, in_axes=-1, out_axes=-1)
        self._step_v = jax.vmap(env.step, in_axes=-1, out_axes=-1)
        self._step_env_v = jax.vmap(env.step_env, in_axes=-1, out_axes=-1)

    def reset(self, key):
        """key: single (2,) key — split into per-env keys."""
        return self._reset_v(make_keys(key, self.n_envs))

    def step(self, state, actions, keys):
        """Auto-resetting step. actions (A, B), keys (2, B)."""
        return self._step_v(state, actions, keys)

    def step_env(self, state, actions, keys):
        """Raw step without auto-reset/truncation."""
        return self._step_env_v(state, actions, keys)
