"""Batched execution: vmap-vs-single equivalence, rollout, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

import rsoccer_tpu
from rsoccer_tpu.batch import rollout as R
from rsoccer_tpu.batch.vecenv import BatchedEnv


def test_vmap_matches_single_env():
    env = rsoccer_tpu.make("VSS-v0")
    B = 4
    benv = BatchedEnv(env, B)
    keys = jax.random.split(jax.random.PRNGKey(0), B).T
    bstate, bobs = benv._reset_v(keys)
    actions = jax.random.uniform(
        jax.random.PRNGKey(1), (env.action_size, B), minval=-1, maxval=1
    )
    skeys = jax.random.split(jax.random.PRNGKey(2), B).T
    bs2, bobs2, br, bterm, btrunc, binfo = benv.step(bstate, actions, skeys)

    for i in range(B):
        s, o = env.reset(keys[:, i])
        s2, o2, r, term, trunc, info = env.step(s, actions[:, i], skeys[:, i])
        np.testing.assert_allclose(np.asarray(o), np.asarray(bobs[:, i]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(bobs2[:, i]), atol=1e-6)
        np.testing.assert_allclose(float(r), float(br[i]), atol=1e-6)
        assert bool(term) == bool(bterm[i])


def test_rollout_runs_and_is_deterministic():
    env = rsoccer_tpu.make("VSS-v0")
    B = 32
    benv = BatchedEnv(env, B)
    roll = jax.jit(R.make_rollout_fn(benv, 50, unroll=2))
    c1 = R.init_carry(benv, jax.random.PRNGKey(7))
    c2 = R.init_carry(benv, jax.random.PRNGKey(7))
    _, m1 = roll(c1)
    _, m2 = roll(c2)
    np.testing.assert_allclose(
        float(m1.total_reward), float(m2.total_reward), rtol=1e-6
    )
    assert int(m1.episodes) == int(m2.episodes)


def test_rollout_episode_accounting():
    env = rsoccer_tpu.make("VSS-v0")
    B = 8
    benv = BatchedEnv(env, B)
    # force truncation quickly by starting near the limit
    state, obs = benv.reset(jax.random.PRNGKey(0))
    state = state._replace(
        steps=jnp.full((B,), env.max_episode_steps - 3, jnp.int32)
    )
    carry = R.RolloutCarry(
        state, obs, jax.random.split(jax.random.PRNGKey(1), B).T,
        jax.random.PRNGKey(9), jnp.zeros((B,)), jnp.zeros((B,)),
    )
    roll = jax.jit(R.make_rollout_fn(benv, 10, unroll=1))
    _, ms = roll(carry)
    # every env truncates at least once within 10 steps
    assert int(ms.episodes) >= B


def test_steps_counter_resets_per_env_independently():
    env = rsoccer_tpu.make("VSS-v0")
    B = 3
    benv = BatchedEnv(env, B)
    state, obs = benv.reset(jax.random.PRNGKey(0))
    # env 1 at the cliff, others not
    steps = jnp.asarray([0, env.max_episode_steps - 1, 5], jnp.int32)
    state = state._replace(steps=steps)
    keys = jax.random.split(jax.random.PRNGKey(1), B).T
    acts = jnp.zeros((2, B))
    ns, *_ , trunc, info = benv.step(state, acts, keys)
    assert list(np.asarray(trunc)) == [False, True, False]
    assert int(ns.steps[1]) == 0
    assert int(ns.steps[0]) == 1 and int(ns.steps[2]) == 6
