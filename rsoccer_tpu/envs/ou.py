"""Ornstein-Uhlenbeck action noise as explicit state.

The reference's ``OrnsteinUhlenbeckAction`` (Utils/Utils.py:5-29) is a
stateful object drawing from the *global* numpy RNG; here the process state
``x_prev`` lives in the env-state pytree and each step advances it with an
explicit PRNG key — same process (theta=0.17, mu=(high+low)/2,
sigma=(high-mu)/2, Euler-Maruyama with sqrt(dt) noise), reproducible and
vmappable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

OU_THETA = 0.17  # reference Utils/Utils.py:6


def ou_update(x_prev, noise, dt: float, mu: float = 0.0, sigma: float = 0.5):
    """One OU update from pre-drawn standard-normal ``noise`` (reference
    Utils/Utils.py:14-21).  Works on any shape."""
    return x_prev + OU_THETA * (mu - x_prev) * dt + sigma * math.sqrt(dt) * noise


def ou_step(x_prev, key, dt: float, mu: float = 0.0, sigma: float = 0.5):
    """Key-based convenience wrapper over :func:`ou_update`."""
    return ou_update(x_prev, jax.random.normal(key, x_prev.shape), dt, mu, sigma)


def ou_reset(shape):
    """Reference resets to zeros (x0=None path, Utils/Utils.py:23-24)."""
    return jnp.zeros(shape)
