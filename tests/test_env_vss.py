"""VSS-v0 behavioral spec tests.

Checks the env against the reference's documented behavior
(vss/env_vss/vss_gym.py) using independent numpy formulations — obs layout,
action conversion, reward terms, termination, reset distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rsoccer_tpu
from rsoccer_tpu.core.field import vss_field

FIELD = vss_field(0)
MAX_POS = 0.9
MAX_V = FIELD.max_v
MAX_W_RAD = MAX_V / 0.04


@pytest.fixture(scope="module")
def env():
    return rsoccer_tpu.make("VSS-v0")


def test_spaces(env):
    assert env.obs_size == 40
    assert env.action_size == 2
    assert env.max_episode_steps == 1200


def test_reset_obs_layout(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    w = state.world
    obs = np.asarray(obs)
    assert obs.shape == (40,)
    # ball block
    np.testing.assert_allclose(obs[0], np.clip(w.ball.x / MAX_POS, -1.2, 1.2), rtol=1e-5)
    np.testing.assert_allclose(obs[1], np.clip(w.ball.y / MAX_POS, -1.2, 1.2), rtol=1e-5)
    np.testing.assert_allclose(obs[2], 0.0, atol=1e-7)  # ball at rest
    # blue robot i block at 4 + 7i
    for i in range(3):
        o = obs[4 + 7 * i : 4 + 7 * (i + 1)]
        np.testing.assert_allclose(o[0], np.clip(w.robots.x[i] / MAX_POS, -1.2, 1.2), rtol=1e-5)
        np.testing.assert_allclose(o[2], np.sin(w.robots.theta[i]), rtol=1e-5)
        np.testing.assert_allclose(o[3], np.cos(w.robots.theta[i]), rtol=1e-5)
    # yellow robot i block at 25 + 5i
    for i in range(3):
        o = obs[25 + 5 * i : 25 + 5 * (i + 1)]
        np.testing.assert_allclose(o[0], np.clip(w.robots.x[3 + i] / MAX_POS, -1.2, 1.2), rtol=1e-5)
        np.testing.assert_allclose(o[1], np.clip(w.robots.y[3 + i] / MAX_POS, -1.2, 1.2), rtol=1e-5)


def test_reset_distribution(env):
    for seed in range(10):
        state, _ = env.reset(jax.random.PRNGKey(seed))
        w = state.world
        xs = np.concatenate([[np.asarray(w.ball.x)], np.asarray(w.robots.x)])
        ys = np.concatenate([[np.asarray(w.ball.y)], np.asarray(w.robots.y)])
        assert np.all(np.abs(xs) <= FIELD.half_length - 0.1 + 1e-6)
        assert np.all(np.abs(ys) <= FIELD.half_width - 0.1 + 1e-6)
        p = np.stack([xs, ys], -1)
        d = np.linalg.norm(p[:, None] - p[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() >= 0.1 - 1e-6
        assert int(state.steps) == 0
        assert not bool(state.has_potential)


def test_action_deadzone_and_scaling(env):
    # action fraction below deadzone/max_v is zeroed before /wheel_radius
    wl, wr = env._actions_to_wheels(jnp.array([0.03, 0.5]))
    assert float(wl) == 0.0  # 0.03*1.199 = 0.036 < 0.05 deadzone
    np.testing.assert_allclose(
        float(wr), 0.5 * MAX_V / FIELD.rbt_wheel_radius, rtol=1e-5
    )
    wl, _ = env._actions_to_wheels(jnp.array([5.0, 0.0]))
    np.testing.assert_allclose(float(wl), MAX_V / FIELD.rbt_wheel_radius, rtol=1e-5)


def _place_ball(state, x, y, vx=0.0, vy=0.0):
    w = state.world
    return state._replace(
        world=w._replace(
            ball=w.ball._replace(
                x=jnp.asarray(x), y=jnp.asarray(y),
                v_x=jnp.asarray(vx), v_y=jnp.asarray(vy),
            )
        )
    )


def test_goal_blue_terminates_with_plus_10(env):
    state, _ = env.reset(jax.random.PRNGKey(3))
    # ball just inside the goal mouth moving in fast: crosses this step
    state = _place_ball(state, FIELD.half_length - 0.01, 0.0, 2.0, 0.0)
    ns, obs, r, term, info = env.step_env(
        state, jnp.zeros(2), jax.random.PRNGKey(4)
    )
    assert bool(term)
    assert float(r) == 10.0
    assert float(info["goal_score"]) == 1.0
    assert float(info["goals_blue"]) == 1.0


def test_goal_yellow_terminates_with_minus_10(env):
    state, _ = env.reset(jax.random.PRNGKey(5))
    state = _place_ball(state, -(FIELD.half_length - 0.01), 0.0, -2.0, 0.0)
    ns, obs, r, term, info = env.step_env(
        state, jnp.zeros(2), jax.random.PRNGKey(6)
    )
    assert bool(term)
    assert float(r) == -10.0
    assert float(info["goals_yellow"]) == 1.0


def test_first_step_ball_grad_is_zero(env):
    # previous potential is None after reset -> grad contributes 0
    state, _ = env.reset(jax.random.PRNGKey(7))
    ns, obs, r, term, info = env.step_env(
        state, jnp.zeros(2), jax.random.PRNGKey(8)
    )
    assert float(info["ball_grad"]) == 0.0
    assert bool(ns.has_potential)


def test_energy_penalty_formula(env):
    state, _ = env.reset(jax.random.PRNGKey(9))
    state = _place_ball(state, 0.0, 0.0)  # away from goals
    act = jnp.array([1.0, -1.0])
    ns, obs, r, term, info = env.step_env(state, act, jax.random.PRNGKey(10))
    wheel = MAX_V / FIELD.rbt_wheel_radius
    np.testing.assert_allclose(
        float(info["energy"]), 2e-4 * -(wheel + wheel), rtol=1e-5
    )


def test_shaped_reward_composition(env):
    state, _ = env.reset(jax.random.PRNGKey(11))
    ns, obs, r, term, info = env.step_env(
        state, jnp.array([0.3, 0.3]), jax.random.PRNGKey(12)
    )
    total = float(info["move"]) + float(info["ball_grad"]) + float(info["energy"])
    np.testing.assert_allclose(float(r), total, rtol=1e-4, atol=1e-6)


def test_ball_potential_formula_against_numpy(env):
    # independent numpy evaluation of the potential gradient (spec from
    # vss_gym.py:256-283)
    state, _ = env.reset(jax.random.PRNGKey(13))
    state = _place_ball(state, 0.2, 0.1)
    # step 1 primes the potential
    s1, *_ = env.step_env(state, jnp.zeros(2), jax.random.PRNGKey(14))

    def potential(bx, by):
        half_l = FIELD.half_length + FIELD.goal_depth
        dx_d = (half_l + bx) * 100
        dx_a = (half_l - bx) * 100
        dy = by * 100
        dist_1 = -np.sqrt(dx_a**2 + 2 * dy**2)
        dist_2 = np.sqrt(dx_d**2 + 2 * dy**2)
        return ((dist_1 + dist_2) / (FIELD.length * 100) - 1) / 2

    prev = potential(float(s1.world.ball.x), float(s1.world.ball.y))
    np.testing.assert_allclose(float(s1.ball_potential), prev, rtol=1e-4)

    s2, obs, r, term, info = env.step_env(s1, jnp.zeros(2), jax.random.PRNGKey(15))
    cur = potential(float(s2.world.ball.x), float(s2.world.ball.y))
    expect = np.clip((cur - prev) * 3 / 0.025, -5, 5)
    got = float(info["ball_grad"]) - float(s1.shaping[2])
    np.testing.assert_allclose(got, 0.8 * expect, rtol=1e-3, atol=1e-5)


def test_autoreset_on_goal(env):
    state, _ = env.reset(jax.random.PRNGKey(16))
    state = _place_ball(state, FIELD.half_length - 0.01, 0.0, 2.0, 0.0)
    ns, obs, r, term, trunc, info = env.step(
        state, jnp.zeros(2), jax.random.PRNGKey(17)
    )
    assert bool(term)
    # returned state is a fresh episode
    assert int(ns.steps) == 0
    assert abs(float(ns.world.ball.x)) <= FIELD.half_length - 0.1 + 1e-6
    assert float(jnp.sum(jnp.abs(ns.shaping))) == 0.0


def test_truncation_at_limit(env):
    state, _ = env.reset(jax.random.PRNGKey(18))
    state = state._replace(steps=jnp.asarray(1199, jnp.int32))
    state = _place_ball(state, 0.0, 0.0)
    ns, obs, r, term, trunc, info = env.step(
        state, jnp.zeros(2), jax.random.PRNGKey(19)
    )
    assert bool(trunc) and not bool(term)
    assert int(ns.steps) == 0  # auto-reset


def test_jit_eager_equivalence(env):
    state, _ = env.reset(jax.random.PRNGKey(20))
    act = jnp.array([0.4, -0.2])
    key = jax.random.PRNGKey(21)
    eager = env.step_env(state, act, key)
    jitted = jax.jit(env.step_env)(state, act, key)
    for a, b in zip(jax.tree.leaves(eager), jax.tree.leaves(jitted)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
