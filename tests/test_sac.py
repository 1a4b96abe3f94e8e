"""SAC trainer tests: buffer mechanics, updates, end-to-end step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rsoccer_tpu
from rsoccer_tpu.batch.vecenv import BatchedEnv
from rsoccer_tpu.models.sac import Buffer, SACConfig, SACTrainer


def test_buffer_circular_and_sample():
    buf = Buffer.init(8, 3, 2)
    obs = jnp.arange(12.0).reshape(4, 3)
    act = jnp.ones((4, 2))
    buf = buf.add_batch(obs, act, jnp.ones(4), obs + 1, jnp.zeros(4))
    assert int(buf.ptr) == 4 and int(buf.filled) == 4
    buf = buf.add_batch(obs, act, jnp.ones(4), obs + 1, jnp.zeros(4))
    buf = buf.add_batch(obs + 100, act, jnp.ones(4), obs, jnp.zeros(4))
    assert int(buf.ptr) == 4 and int(buf.filled) == 8  # wrapped
    # slots 0..3 hold the newest (+100) batch
    np.testing.assert_allclose(np.asarray(buf.obs[0]), np.asarray(obs[0] + 100))
    o, a, r, no, d = buf.sample(jax.random.PRNGKey(0), 16)
    assert o.shape == (16, 3) and a.shape == (16, 2)


@pytest.fixture(scope="module")
def trainer():
    env = rsoccer_tpu.make("VSS-v0")
    benv = BatchedEnv(env, 16)
    cfg = SACConfig(buffer_size=1 << 10, batch_size=64, warmup_steps=2)
    return SACTrainer(benv, cfg)


def test_train_step_runs_and_updates(trainer):
    state = trainer.init(jax.random.PRNGKey(0))
    step = jax.jit(trainer.train_step)
    s1, m1 = step(state, jax.random.PRNGKey(1))
    assert int(s1.total_steps) == 1
    for k_ in ("q_loss", "actor_loss", "alpha", "mean_reward"):
        assert np.isfinite(float(m1[k_])), k_
    # params changed
    p0 = jax.tree.leaves(state.actor_params)[0]
    p1 = jax.tree.leaves(s1.actor_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # targets moved toward the new critics (polyak)
    t0 = jax.tree.leaves(state.q1_target)[0]
    t1 = jax.tree.leaves(s1.q1_target)[0]
    assert not np.allclose(np.asarray(t0), np.asarray(t1))


def test_chained_steps_fill_buffer(trainer):
    state = trainer.init(jax.random.PRNGKey(0))
    step = jax.jit(trainer.train_step)
    for i in range(5):
        state, m = step(state, jax.random.PRNGKey(10 + i))
    assert int(state.buffer.filled) == 5 * 16
    assert np.isfinite(float(m["q_loss"]))


def test_policy_deterministic_in_bounds(trainer):
    state = trainer.init(jax.random.PRNGKey(0))
    policy = trainer.make_policy(state.actor_params)
    obs = jnp.zeros((trainer.benv.obs_size, 16))
    acts = policy(jax.random.PRNGKey(0), obs)
    assert acts.shape == (2, 16)
    assert float(jnp.abs(acts).max()) <= 1.0
