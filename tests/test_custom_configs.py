"""Custom env configurations beyond the registered defaults.

The reference documents custom-env authoring (base classes take field_type /
robot counts — vss/README.md:4, ssl/README.md:4); these tests pin that the
functional envs honour the same degrees of freedom.
"""

import jax
import jax.numpy as jnp
import numpy as np

import rsoccer_tpu
from rsoccer_tpu.core.frame import frame_from_batched, frame_from_world
from rsoccer_tpu.envs import VSSEnv


def test_vss_5v5_field_type_1():
    env = VSSEnv(field_type=1, n_robots_blue=5, n_robots_yellow=5)
    assert env.obs_size == 4 + 7 * 5 + 5 * 5  # 64
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (64,)
    s2, obs2, r, term, trunc, info = env.step(
        state, jnp.zeros(2), jax.random.PRNGKey(1)
    )
    assert obs2.shape == (64,)
    assert bool(jnp.isfinite(obs2).all())
    # larger field -> larger max_pos normaliser
    assert env.max_pos == max(1.8 / 2, 2.2 / 2 + 0.15)


def test_vss_1v0_minimal():
    env = VSSEnv(n_robots_blue=1, n_robots_yellow=0)
    assert env.obs_size == 11
    state, obs = env.reset(jax.random.PRNGKey(0))
    for t in range(5):
        state, obs, r, term, trunc, info = env.step(
            state, jnp.asarray([0.5, 0.5]), jax.random.PRNGKey(t)
        )
    assert bool(jnp.isfinite(obs).all())


def test_frame_views():
    env = VSSEnv()
    state, _ = env.reset(jax.random.PRNGKey(0))
    f = frame_from_world(state.world, 3, 3)
    assert len(f.robots_blue) == 3 and len(f.robots_yellow) == 3
    assert 0 <= f.robots_blue[0].theta < 360

    from rsoccer_tpu.batch.vecenv import BatchedEnv

    benv = BatchedEnv(env, 4)
    bstate, _ = benv.reset(jax.random.PRNGKey(1))
    f2 = frame_from_batched(bstate.world, 2, 3, 3)
    assert f2.ball.x is not None
    # matches the slice
    np.testing.assert_allclose(
        f2.ball.x, float(bstate.world.ball.x[2]), rtol=1e-6
    )


def test_multiagent_vss():
    env = rsoccer_tpu.make("VSSMultiAgent-v0")
    assert env.action_size == 6
    assert env.obs_size == 40
    state, obs = env.reset(jax.random.PRNGKey(0))
    # drive all three blues forward
    act = jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0, 1.0])
    x0 = np.asarray(state.world.robots.x[:3]).copy()
    for t in range(20):
        state, obs, r, term, trunc, info = env.step(state, act, jax.random.PRNGKey(t))
        if bool(term) or bool(trunc):
            break
    moved = np.abs(np.asarray(state.world.robots.x[:3]) - x0) + 1e-9
    assert (moved > 1e-3).all()  # every blue moved under policy control
    assert bool(jnp.isfinite(obs).all())


def test_multiagent_vss_batched():
    from rsoccer_tpu.batch.vecenv import BatchedEnv

    env = rsoccer_tpu.make("VSSMultiAgent-v0")
    benv = BatchedEnv(env, 8)
    state, obs = benv.reset(jax.random.PRNGKey(0))
    acts = jnp.zeros((6, 8))
    ns, obs2, r, te, tr, info = jax.jit(benv.step)(state, acts, jax.random.PRNGKey(1))
    assert obs2.shape == (40, 8)


def test_sd_curriculum_oversamples_contested_spawns():
    """Training-time kwarg: ~half the resets put the ball 0.21-0.5 m from
    defender 0; the default env keeps the reference spawn distribution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rsoccer_tpu.batch.vecenv import BatchedEnv
    from rsoccer_tpu.envs.ssl_static_defenders import SSLStaticDefendersEnv

    def near_frac(env, n=512):
        benv = BatchedEnv(env, n)
        state, _ = benv.reset(jax.random.PRNGKey(0))
        bx, by = state.world.ball.x, state.world.ball.y
        dx = state.world.robots.x[1:] - bx[None]
        dy = state.world.robots.y[1:] - by[None]
        dmin = jnp.sqrt(dx * dx + dy * dy).min(axis=0)
        # spawns legal in both modes
        assert float(bx.min()) >= 0.2 - 1e-6
        f = env.field
        in_gk = (bx > f.half_length - f.penalty_length) & (
            jnp.abs(by) < f.penalty_width / 2
        )
        assert not bool(in_gk.any())
        return float((dmin < 0.55).mean())

    base = near_frac(SSLStaticDefendersEnv())
    cur = near_frac(SSLStaticDefendersEnv(curriculum=True))
    assert base < 0.25, base      # rare under the reference distribution
    assert cur > 0.35, cur        # ~half under the curriculum
