"""Long-horizon numerical stability: no NaN/Inf, bounded state, under random
and extreme actions (the reference leans on ODE for stability; our
fixed-substep integrator must hold up on its own)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rsoccer_tpu
from rsoccer_tpu.batch import rollout as R
from rsoccer_tpu.batch.vecenv import BatchedEnv


@pytest.mark.parametrize("env_id", rsoccer_tpu.registered_ids())
def test_random_policy_long_run_finite(env_id):
    env = rsoccer_tpu.make(env_id)
    benv = BatchedEnv(env, 64)
    roll = jax.jit(R.make_rollout_fn(benv, 500, unroll=1))
    carry = R.init_carry(benv, jax.random.PRNGKey(0))
    carry, ms = roll(carry)
    for leaf in jax.tree.leaves(carry.state):
        assert bool(jnp.isfinite(jnp.asarray(leaf, jnp.float32)).all()), env_id
    assert bool(jnp.isfinite(carry.obs).all())
    assert np.isfinite(float(ms.total_reward))


def test_extreme_actions_bounded_vss():
    env = rsoccer_tpu.make("VSS-v0")
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    f = env.field
    for t in range(300):
        # slam max actions, alternating sign every step
        a = jnp.asarray([1e6, -1e6]) * (1.0 if t % 2 else -1.0)
        state, obs, r, term, trunc, info = step(state, a, jax.random.PRNGKey(t))
    w = state.world
    # robots stay inside the walls, ball inside field+pockets
    assert bool((jnp.abs(w.robots.x) <= f.half_length).all())
    assert bool((jnp.abs(w.robots.y) <= f.half_width).all())
    assert bool(jnp.abs(w.ball.x) <= f.half_length + f.goal_depth)
    assert bool(jnp.isfinite(obs).all())
    # speeds bounded by the drive model
    assert float(jnp.abs(w.robots.v_x).max()) < 3.0


def test_ssl_extreme_actions_finite():
    env = rsoccer_tpu.make("SSLStaticDefenders-v0")
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for t in range(200):
        a = jnp.asarray([1.0, -1.0, 1.0, 1.0, 1.0]) * (1 if t % 3 else -1)
        state, obs, r, term, trunc, info = step(state, a, jax.random.PRNGKey(t))
    assert bool(jnp.isfinite(obs).all())
    for leaf in jax.tree.leaves(state.world):
        assert bool(jnp.isfinite(jnp.asarray(leaf, jnp.float32)).all())
