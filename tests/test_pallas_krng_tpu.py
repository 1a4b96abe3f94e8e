"""TPU-only tests for the in-kernel hardware-RNG full-step path.

``rng="kernel"`` draws every uniform the step needs (OU noise, spawn
candidates, headings) inside the kernel with ``pltpu.prng_random_bits``
instead of streaming XLA-generated noise blocks through HBM.  The noise
STREAM therefore differs from the input-noise path by construction — these
tests pin the properties that must still hold: determinism for a fixed
key, state/obs sanity, episode turnover, and CPU's clear rejection.

The CI suite runs on CPU where only the rejection test executes; run the
rest manually on the TPU (`pytest tests/test_pallas_krng_tpu.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rsoccer_tpu
from rsoccer_tpu.batch import rollout as R
from rsoccer_tpu.batch.vecenv import BatchedEnv

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="in-kernel RNG requires TPU"
)

ALL_IDS = [
    "VSS-v0",
    "SSLStaticDefenders-v0",
    "SSLContestedPossession-v0",
    "SSLDribbling-v0",
    "SSLPassEndurance-v0",
]


def _krng_env(env_id, n_envs=256, max_episode_steps=16):
    env = rsoccer_tpu.make(env_id)
    env.max_episode_steps = max_episode_steps
    return BatchedEnv(
        env, n_envs, pallas_full=True, pallas_tile=n_envs, pallas_rng="kernel"
    )


@tpu_only
@pytest.mark.parametrize("env_id", ALL_IDS)
def test_krng_rollout_sane_and_deterministic(env_id):
    benv = _krng_env(env_id)
    roll = jax.jit(R.make_rollout_fn(benv, 48))

    def run():
        carry = R.init_carry(benv, jax.random.PRNGKey(0))
        carry, ms = roll(carry)
        return carry, ms

    c1, m1 = run()
    c2, m2 = run()
    st1 = np.asarray(c1.state)
    assert np.isfinite(st1).all()
    obs = np.asarray(c1.obs)
    assert np.isfinite(obs).all() and np.abs(obs).max() <= 1.2 + 1e-5
    # short TimeLimit guarantees turnover even under random-ish actions
    assert int(m1.episodes) > 0
    np.testing.assert_array_equal(st1, np.asarray(c2.state))
    np.testing.assert_array_equal(np.asarray(c1.obs), np.asarray(c2.obs))
    assert float(m1.total_reward) == float(m2.total_reward)


@tpu_only
def test_krng_spawns_cover_field():
    """In-kernel spawn uniforms must actually vary across lanes/resets —
    guard against a constant-bits PRNG wiring bug."""
    benv = _krng_env("VSS-v0", n_envs=512, max_episode_steps=8)
    roll = jax.jit(R.make_rollout_fn(benv, 32))
    carry = R.init_carry(benv, jax.random.PRNGKey(3))
    carry, _ = roll(carry)
    up = benv.unpack_state(carry.state)
    xs = np.asarray(up.world.robots.x)
    assert xs.std() > 0.05
    # different seeds -> different worlds
    carry_b = R.init_carry(benv, jax.random.PRNGKey(4))
    carry_b, _ = roll(carry_b)
    assert not np.array_equal(np.asarray(carry.state), np.asarray(carry_b.state))


def test_krng_rejected_off_tpu():
    if jax.default_backend() == "tpu":
        pytest.skip("rejection applies off-TPU only")
    with pytest.raises(NotImplementedError, match="requires a TPU"):
        _krng_env("VSS-v0", n_envs=8)
