"""Ornstein-Uhlenbeck noise statistics match the reference process.

Reference: Utils/Utils.py:5-29 — theta=0.17, mu=0, sigma=0.5 for [-1,1]
action spaces, Euler-Maruyama with sqrt(dt) noise scaling.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rsoccer_tpu.envs import ou


def test_reset_is_zero():
    x = ou.ou_reset((6, 2))
    assert x.shape == (6, 2)
    assert np.all(np.asarray(x) == 0)


def test_single_step_moments():
    # x1 = 0 + theta*(0-0)*dt + sigma*sqrt(dt)*N -> std = 0.5*sqrt(0.025)
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    xs = jax.vmap(lambda k: ou.ou_step(jnp.zeros(()), k, 0.025))(keys)
    x = np.asarray(xs)
    assert abs(x.mean()) < 0.01
    np.testing.assert_allclose(x.std(), 0.5 * np.sqrt(0.025), rtol=0.05)


def test_stationary_variance():
    # OU stationary std = sigma*sqrt(dt)/sqrt(2*theta*dt - (theta*dt)^2)
    # ~= sigma/sqrt(2*theta) for small dt
    dt, theta, sigma = 0.025, 0.17, 0.5
    key = jax.random.PRNGKey(1)
    x = jnp.zeros((2000,))
    for i in range(600):
        key, k = jax.random.split(key)
        x = ou.ou_step(x, k, dt)
    expect = sigma / np.sqrt(2 * theta)
    np.testing.assert_allclose(np.asarray(x).std(), expect, rtol=0.1)


def test_mean_reversion():
    # deterministic part pulls toward mu
    x = jnp.full((4,), 2.0)
    key = jax.random.PRNGKey(2)
    x1 = ou.ou_step(x, key, 0.025, sigma=0.0)
    np.testing.assert_allclose(
        np.asarray(x1), 2.0 + 0.17 * (0.0 - 2.0) * 0.025, rtol=1e-6
    )
