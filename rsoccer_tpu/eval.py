"""Evaluation suite: deterministic-policy rollouts with per-task success metrics.

The reference has no evaluation tooling at all (its README example is a
random-policy loop, README.md:116-133).  Training code needs more than mean
reward: per-task SUCCESS criteria, defined from each task's own terminal
semantics:

  VSS-v0 / VSSMultiAgent-v0   scored a goal (info ``goals_blue``;
                              vss_gym.py:161-169)
  SSLStaticDefenders-v0       scored a goal (info ``goal``;
                              static_defenders.py:188-193)
  SSLContestedPossession-v0   scored a goal (info ``goal``;
                              contested_possession.py:171-176)
  SSLDribbling-v0             passed all 7 checkpoints — episode return is
                              exactly the checkpoint count (+1 each,
                              dribbling.py:156-181)
  SSLPassEndurance-v0         pass received — the only +1 terminal reward
                              (pass_endurance.py:128-156)

All evaluation runs on-device in one jitted scan; metrics come back as a
small pytree of scalars.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from rsoccer_tpu.batch import rollout as R
from rsoccer_tpu.batch.vecenv import BatchedEnv


class EvalMetrics(NamedTuple):
    episodes: jnp.ndarray  # completed episodes observed
    successes: jnp.ndarray  # of those, how many met the task's success test
    total_reward: jnp.ndarray
    episode_return_sum: jnp.ndarray  # over completed episodes
    episode_length_sum: jnp.ndarray

    @property
    def success_rate(self):
        return self.successes / jnp.maximum(self.episodes, 1)

    @property
    def mean_episode_return(self):
        return self.episode_return_sum / jnp.maximum(self.episodes, 1)

    @property
    def mean_episode_length(self):
        return self.episode_length_sum / jnp.maximum(self.episodes, 1)

    def summary(self) -> dict:
        return {
            "episodes": int(self.episodes),
            "successes": int(self.successes),
            "success_rate": float(self.success_rate),
            "mean_episode_return": float(self.mean_episode_return),
            "mean_episode_length": float(self.mean_episode_length),
        }


# success(reward, ep_return, info) -> (B,) bool, evaluated on done lanes only.
SuccessFn = Callable[[jnp.ndarray, jnp.ndarray, dict], jnp.ndarray]


def _goal_from_info(key):
    def fn(reward, ep_return, info):
        return info[key] > 0.5

    return fn


_SUCCESS: dict[str, SuccessFn] = {
    "VSS-v0": _goal_from_info("goals_blue"),
    "VSSMultiAgent-v0": _goal_from_info("goals_blue"),
    "VSSSelfPlay-v0": _goal_from_info("goals_blue"),
    "SSLStaticDefenders-v0": _goal_from_info("goal"),
    "SSLContestedPossession-v0": _goal_from_info("goal"),
    # +1 per checkpoint; 7 checkpoints completes the course
    "SSLDribbling-v0": lambda reward, ep_return, info: ep_return >= 6.5,
    # terminal +1 only on a received pass (shaping |ball_grad| << 1 per step)
    "SSLPassEndurance-v0": lambda reward, ep_return, info: reward > 0.99,
}


def success_criterion(env_id: str) -> SuccessFn:
    try:
        return _SUCCESS[env_id]
    except KeyError:
        raise KeyError(
            f"no success criterion registered for {env_id!r}; "
            f"known: {sorted(_SUCCESS)}"
        ) from None


def make_eval_fn(
    benv: BatchedEnv,
    n_steps: int,
    policy: Callable,
    success: SuccessFn,
    unroll: int = 1,
    carry_init: Callable | None = None,
):
    """Build ``evaluate(key) -> EvalMetrics`` — fresh reset, ``n_steps``
    batched steps, deterministic given the key.  Jit the result.

    ``carry_init``: optional transform of the freshly-reset RolloutCarry —
    e.g. self-play swaps a specific frozen-opponent payload into the env
    state before the scan."""

    def metrics_fn(reward, done, ep_ret, ep_len, info):
        won = done & success(reward, ep_ret, info)
        return EvalMetrics(
            episodes=jnp.sum(done.astype(jnp.int32)),
            successes=jnp.sum(won.astype(jnp.int32)),
            total_reward=jnp.sum(reward),
            episode_return_sum=jnp.sum(jnp.where(done, ep_ret, 0.0)),
            episode_length_sum=jnp.sum(jnp.where(done, ep_len, 0.0)),
        )

    one_step = R.make_step_fn(benv, policy, metrics_fn)

    def evaluate(key) -> EvalMetrics:
        carry = R.init_carry(benv, key)
        if carry_init is not None:
            carry = carry_init(carry)
        carry, ms = jax.lax.scan(
            one_step, carry, None, length=n_steps, unroll=unroll
        )
        return jax.tree.map(jnp.sum, ms)

    return evaluate


def evaluate_policy(
    env_id: str,
    policy: Callable,
    n_envs: int = 256,
    n_steps: int | None = None,
    seed: int = 0,
    **env_kwargs,
) -> dict:
    """One-call evaluation: metrics dict for ``policy`` on ``env_id``.

    ``n_steps`` defaults to 2x the env's episode limit so every env
    completes at least one episode even if the policy never terminates
    early.  ``policy(key, obs (O,B)) -> actions (A,B)``.
    """
    import rsoccer_tpu

    env = rsoccer_tpu.make(env_id, **env_kwargs)
    benv = BatchedEnv(env, n_envs)
    if n_steps is None:
        n_steps = 2 * env.max_episode_steps
    fn = jax.jit(
        make_eval_fn(benv, n_steps, policy, success_criterion(env_id))
    )
    ms = fn(jax.random.PRNGKey(seed))
    out = ms.summary()
    out["env_id"] = env_id
    out["n_envs"] = n_envs
    out["n_steps"] = n_steps
    return out
