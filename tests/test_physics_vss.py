"""VSS physics unit tests against analytic expectations."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsoccer_tpu.core.field import vss_field
from rsoccer_tpu.core.state import VSSCommands, make_world
from rsoccer_tpu.physics.config import VSS_PHYSICS
from rsoccer_tpu.physics.vss import HALF_AXLE, make_vss_step

FIELD = vss_field(0)
DT = 0.025


@pytest.fixture
def step():
    return make_vss_step(FIELD, VSS_PHYSICS, DT)


def world_with(ball=(0.0, 0.0, 0.0, 0.0), robots=None, n=6):
    w = make_world(n)
    bx, by, bvx, bvy = ball
    w = w._replace(
        ball=w.ball._replace(
            x=jnp.asarray(bx), y=jnp.asarray(by),
            v_x=jnp.asarray(bvx), v_y=jnp.asarray(bvy),
        )
    )
    # park all robots in a far corner line so unused ones don't interfere
    rb = w.robots._replace(
        x=jnp.linspace(-0.7, -0.2, n), y=jnp.full((n,), -0.6)
    )
    w = w._replace(robots=rb)
    if robots:
        rb = w.robots
        for i, (x, y, theta) in enumerate(robots):
            rb = rb._replace(
                x=rb.x.at[i].set(x), y=rb.y.at[i].set(y),
                theta=rb.theta.at[i].set(theta),
            )
        w = w._replace(robots=rb)
    return w


def drive(step, w, wl, wr, n_steps):
    n = w.robots.x.shape[0]
    cmd = VSSCommands(
        v_wheel0=jnp.full((n,), wl), v_wheel1=jnp.full((n,), wr)
    )
    for _ in range(n_steps):
        w = step(w, cmd)
    return w


def test_straight_drive_reaches_commanded_speed(step):
    # equal wheels -> straight line along heading at v = r*(wl+wr)/2
    w = world_with(robots=[(-0.5, 0.3, 0.0)])
    wheel = 20.0  # rad/s  -> v = 0.026*20 = 0.52 m/s
    w = drive(step, w, wheel, wheel, 40)  # 1 s — plenty to converge
    v = float(jnp.sqrt(w.robots.v_x[0] ** 2 + w.robots.v_y[0] ** 2))
    assert abs(v - 0.52) < 0.01
    # heading unchanged, motion along +x
    assert abs(float(w.robots.theta[0])) < 1e-4
    assert float(w.robots.x[0]) > -0.5 + 0.3  # moved forward
    assert abs(float(w.robots.y[0]) - 0.3) < 1e-4


def test_spin_in_place(step):
    # opposite wheels -> pure rotation at w = r*wr/HALF_AXLE
    w = world_with(robots=[(0.0, -0.3, 0.0)])
    wheel = 10.0
    expect_w = FIELD.rbt_wheel_radius * wheel / HALF_AXLE
    w = drive(step, w, -wheel, wheel, 40)
    assert abs(float(w.robots.v_theta[0]) - expect_w) < 0.05
    assert abs(float(w.robots.x[0])) < 1e-3
    assert abs(float(w.robots.y[0]) + 0.3) < 1e-3


def test_wheel_command_clipped_to_motor_limit(step):
    w = world_with(robots=[(0.0, 0.0, 0.0)])
    w = drive(step, w, 1e6, 1e6, 60)
    v = float(jnp.hypot(w.robots.v_x[0], w.robots.v_y[0]))
    assert v <= FIELD.max_v * 1.01


def test_ball_friction_decelerates_to_rest():
    step = make_vss_step(FIELD, VSS_PHYSICS, DT)
    w = world_with(ball=(0.0, 0.0, 0.3, 0.0), robots=[(-0.6, -0.5, 0.0)])
    # v0=0.3, decel=0.6 -> rest in 0.5 s
    w = drive(step, w, 0.0, 0.0, 30)  # 0.75 s
    assert abs(float(w.ball.v_x)) < 1e-3
    # travelled about v^2/(2a) = 0.075 m
    assert 0.05 < float(w.ball.x) < 0.09


def test_ball_bounces_off_side_wall(step):
    w = world_with(ball=(0.0, 0.55, 0.0, 1.0), robots=[(-0.6, -0.5, 0.0)])
    for _ in range(20):  # 0.5 s: reaches wall at y=0.65 then returns
        w = step(w, VSSCommands(jnp.zeros(6), jnp.zeros(6)))
    assert float(w.ball.v_y) < 0.0  # reflected
    assert float(w.ball.y) < FIELD.half_width - FIELD.ball_radius + 1e-6


def test_ball_enters_goal_mouth_not_blocked(step):
    # ball rolling at the goal center must cross the end line
    w = world_with(ball=(0.6, 0.0, 1.5, 0.0), robots=[(-0.6, -0.5, 0.0)])
    crossed = False
    for _ in range(20):
        w = step(w, VSSCommands(jnp.zeros(6), jnp.zeros(6)))
        if float(w.ball.x) > FIELD.half_length:
            crossed = True
    assert crossed
    # and it stays inside the pocket (depth 0.1)
    assert float(w.ball.x) <= FIELD.half_length + FIELD.goal_depth


def test_ball_outside_goal_mouth_is_blocked(step):
    w = world_with(ball=(0.6, 0.4, 1.5, 0.0), robots=[(-0.6, -0.5, 0.0)])
    for _ in range(20):
        w = step(w, VSSCommands(jnp.zeros(6), jnp.zeros(6)))
    assert float(w.ball.x) <= FIELD.half_length


def test_robot_pushes_ball(step):
    # robot drives into a resting ball ahead of it
    w = world_with(ball=(0.1, 0.0, 0.0, 0.0), robots=[(0.0, 0.0, 0.0)])
    w = drive(step, w, 15.0, 15.0, 20)
    assert float(w.ball.x) > 0.12  # ball displaced forward
    assert float(w.ball.v_x) >= 0.0


def test_robots_collide_and_separate(step):
    w = world_with(robots=[(0.0, 0.0, 0.0), (0.05, 0.0, 0.0)])
    w = step(w, VSSCommands(jnp.zeros(6), jnp.zeros(6)))
    dist = float(
        jnp.hypot(
            w.robots.x[0] - w.robots.x[1], w.robots.y[0] - w.robots.y[1]
        )
    )
    assert dist >= 2 * FIELD.rbt_radius - 1e-4


def test_robot_clamped_inside_walls(step):
    w = world_with(robots=[(0.7, 0.0, 0.0)])
    w = drive(step, w, 40.0, 40.0, 40)
    assert float(w.robots.x[0]) <= FIELD.half_length - FIELD.rbt_radius + 1e-6


def test_step_is_deterministic(step):
    w = world_with(ball=(0.1, 0.2, 0.5, -0.3), robots=[(0.0, 0.0, 0.4)])
    cmd = VSSCommands(jnp.full((6,), 5.0), jnp.full((6,), 3.0))
    a = step(w, cmd)
    b = step(w, cmd)
    for la, lb in zip(
        [a.ball.x, a.ball.y, a.robots.x, a.robots.theta],
        [b.ball.x, b.ball.y, b.robots.x, b.robots.theta],
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
