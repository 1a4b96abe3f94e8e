"""Checkpoint + profiling utility tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

import rsoccer_tpu
from rsoccer_tpu.utils import checkpoint
from rsoccer_tpu.utils.profiling import Throughput


def test_checkpoint_roundtrip_env_state(tmp_path):
    env = rsoccer_tpu.make("VSS-v0")
    state, obs = env.reset(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, state)
    restored = checkpoint.restore(path)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_continues_identically(tmp_path):
    env = rsoccer_tpu.make("VSS-v0")
    state, _ = env.reset(jax.random.PRNGKey(0))
    path = str(tmp_path / "mid")
    # advance 3 steps, checkpoint, advance 2 more
    for t in range(3):
        state, *_ = env.step(state, jnp.zeros(2), jax.random.PRNGKey(t))
    checkpoint.save(path, state)
    cont_a = state
    for t in range(3, 5):
        cont_a, _, ra, *_ = env.step(cont_a, jnp.zeros(2), jax.random.PRNGKey(t))
    # restore and replay the same keys
    cont_b = checkpoint.restore(path, like=state)
    cont_b = jax.tree.map(jnp.asarray, cont_b)
    for t in range(3, 5):
        cont_b, _, rb, *_ = env.step(cont_b, jnp.zeros(2), jax.random.PRNGKey(t))
    np.testing.assert_allclose(float(ra), float(rb), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(cont_a.world), jax.tree.leaves(cont_b.world)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_throughput_meter():
    with Throughput(1000) as t:
        pass
    assert t.steps_per_s > 0
