"""Evaluation-suite tests: plumbing, determinism, success criteria."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rsoccer_tpu
from rsoccer_tpu import eval as E
from rsoccer_tpu.batch import rollout as R
from rsoccer_tpu.batch.vecenv import BatchedEnv


def zero_policy(action_size):
    def policy(key, obs):
        return jnp.zeros((action_size, obs.shape[-1]), jnp.float32)

    return policy


def test_success_registry_covers_all_ids():
    for env_id in rsoccer_tpu.registered_ids():
        E.success_criterion(env_id)  # must not raise
    with pytest.raises(KeyError):
        E.success_criterion("NotAnEnv-v0")


def test_success_criteria_semantics():
    b = jnp.zeros((4,))
    info_vss = {"goals_blue": jnp.asarray([1.0, 0.0, 2.0, 0.0])}
    got = E.success_criterion("VSS-v0")(b, b, info_vss)
    np.testing.assert_array_equal(np.asarray(got), [True, False, True, False])

    info_sd = {"goal": jnp.asarray([0.0, 1.0, 0.0, 0.0])}
    got = E.success_criterion("SSLStaticDefenders-v0")(b, b, info_sd)
    np.testing.assert_array_equal(np.asarray(got), [False, True, False, False])

    ep_ret = jnp.asarray([7.0, 6.0, 3.0, 8.0])
    got = E.success_criterion("SSLDribbling-v0")(b, ep_ret, {})
    np.testing.assert_array_equal(np.asarray(got), [True, False, False, True])

    reward = jnp.asarray([1.0, 0.01, -1.0, 0.98])
    got = E.success_criterion("SSLPassEndurance-v0")(reward, b, {})
    np.testing.assert_array_equal(np.asarray(got), [True, False, False, False])


def test_episode_accounting_exact():
    """With a shrunk horizon and no terminal events, episode count is exact
    and all of them are failures."""
    env = rsoccer_tpu.make("SSLPassEndurance-v0")
    env.max_episode_steps = 5
    benv = BatchedEnv(env, 16)
    fn = jax.jit(
        E.make_eval_fn(
            benv, 20, zero_policy(benv.action_size),
            E.success_criterion("SSLPassEndurance-v0"),
        )
    )
    ms = fn(jax.random.PRNGKey(0))
    # zero actions: shooter frozen, ball never moves -> only truncations...
    # except the stopped-ball counter (>20 steps) never fires within 5 steps
    assert int(ms.episodes) == 16 * (20 // 5)
    assert int(ms.successes) == 0
    assert float(ms.mean_episode_length) == 5.0


def test_eval_deterministic_and_bounded():
    pol = zero_policy(2)
    a = E.evaluate_policy("VSS-v0", pol, n_envs=32, n_steps=200, seed=7)
    b = E.evaluate_policy("VSS-v0", pol, n_envs=32, n_steps=200, seed=7)
    assert a == b
    assert 0.0 <= a["success_rate"] <= 1.0
    assert a["n_envs"] == 32


def test_vss_goals_count_as_success():
    """Random-policy VSS with OU-driven teammates scores occasionally; every
    success must coincide with a completed episode and the rate stays in
    [0, 1]."""
    env = rsoccer_tpu.make("VSS-v0")
    benv = BatchedEnv(env, 64)
    fn = jax.jit(
        E.make_eval_fn(
            benv, 400, R.uniform_policy(benv.action_size),
            E.success_criterion("VSS-v0"),
        )
    )
    ms = fn(jax.random.PRNGKey(3))
    assert int(ms.episodes) >= 1  # goals end episodes well before 1200 steps
    assert 0 <= int(ms.successes) <= int(ms.episodes)
