"""Functional environment interface with auto-reset.

The reference structures envs as a template-method class hierarchy: the base
``step`` orchestrates commands -> simulator -> observation -> reward/done
(vss/vss_gym_base.py:72-90, ssl/ssl_gym_base.py:73-90) and episode truncation
is supplied externally by gymnasium's ``TimeLimit`` via the registry's
``max_episode_steps`` (rsoccer_gym/__init__.py:3-30).

Here an env is a plain object holding only static Python constants whose
methods are *pure functions*.  Subclasses implement three hooks:

    reset_state(key)              -> state
    transition(state, act, key)   -> (state, reward, terminated, info)
    observe(state)                -> obs

and the base provides:

    reset(key)                 -> (state, obs)
    step_env(state, act, key)  -> (state, obs, reward, terminated, info)
    step(state, act, key)      -> (state, obs, reward, terminated, truncated, info)

``step`` folds the TimeLimit truncation and auto-reset in: when an episode
ends, the returned state/obs are those of a freshly reset episode (the
returned reward/flags/info still describe the ending step).  The observation
is computed ONCE, from the post-select state — not per branch — which keeps
the fused step lean.  Everything is branch-free so the step jits, vmaps and
scans.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


class Env:
    """Base class — subclasses define obs_size/action_size/max_episode_steps
    and implement reset_state/transition/observe as pure functions."""

    obs_size: int
    action_size: int
    max_episode_steps: int

    # -- to implement ------------------------------------------------------
    def reset_state(self, key):
        raise NotImplementedError

    def transition(self, state, action, key):
        """(state, action, key) -> (next_state, reward, terminated, info)."""
        raise NotImplementedError

    def observe(self, state) -> jnp.ndarray:
        raise NotImplementedError

    # -- provided ----------------------------------------------------------
    def reset(self, key) -> Tuple[Any, jnp.ndarray]:
        state = self.reset_state(key)
        return state, self.observe(state)

    def step_env(self, state, action, key):
        """Raw step: no truncation, no auto-reset."""
        ns, reward, terminated, info = self.transition(state, action, key)
        return ns, self.observe(ns), reward, terminated, info

    def step(self, state, action, key):
        """transition + TimeLimit truncation + auto-reset."""
        key_step, key_reset = jax.random.split(key)
        ns, reward, terminated, info = self.transition(state, action, key_step)
        # gymnasium's TimeLimit sets truncated whenever the step budget is
        # hit, independently of terminated (both may be True on the same
        # step) — mirror that.
        truncated = ns.steps >= self.max_episode_steps
        done = jnp.logical_or(terminated, truncated)
        reset_state = self.reset_state(key_reset)
        out_state = jax.tree.map(
            lambda r, n: jnp.where(done, r, n), reset_state, ns
        )
        return out_state, self.observe(out_state), reward, terminated, truncated, info

    # -- conveniences ------------------------------------------------------
    def zero_info(self) -> Dict[str, jnp.ndarray]:
        return {}
