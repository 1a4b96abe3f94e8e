"""SSL omni-drive physics tests: kinematics, kicker, dribbler, infrared."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsoccer_tpu.core.field import ssl_field
from rsoccer_tpu.core.state import make_world, zero_ssl_commands
from rsoccer_tpu.physics.config import SSL_PHYSICS
from rsoccer_tpu.physics.ssl import make_ssl_step, wheel_jacobian

FIELD = ssl_field(2)
DT = 0.025


@pytest.fixture(scope="module")
def step():
    return make_ssl_step(FIELD, SSL_PHYSICS, DT)


def world2(ball=(0.0, 0.0, 0.0, 0.0), r0=(-1.0, 0.0, 0.0), r1=(-2.0, -2.0, 0.0)):
    w = make_world(2)
    bx, by, bvx, bvy = ball
    w = w._replace(
        ball=w.ball._replace(
            x=jnp.asarray(bx), y=jnp.asarray(by),
            v_x=jnp.asarray(bvx), v_y=jnp.asarray(bvy),
        ),
        robots=w.robots._replace(
            x=jnp.asarray([r0[0], r1[0]]),
            y=jnp.asarray([r0[1], r1[1]]),
            theta=jnp.asarray([r0[2], r1[2]]),
        ),
    )
    return w


def cmd_vel(v_x=0.0, v_y=0.0, v_theta=0.0, kick=0.0, kick_z=0.0, dribbler=False):
    c = zero_ssl_commands(2)
    return c._replace(
        v_x=c.v_x.at[0].set(v_x),
        v_y=c.v_y.at[0].set(v_y),
        v_theta=c.v_theta.at[0].set(v_theta),
        kick_v_x=c.kick_v_x.at[0].set(kick),
        kick_v_z=c.kick_v_z.at[0].set(kick_z),
        dribbler=c.dribbler.at[0].set(dribbler),
    )


def run(step, w, c, n):
    for _ in range(n):
        w = step(w, c)
    return w


def test_jacobian_shape_and_rank():
    J = wheel_jacobian(FIELD)
    assert J.shape == (4, 3)
    assert np.linalg.matrix_rank(J) == 3  # all 3 local DOF commandable


def test_forward_drive_local_x(step):
    w = world2()
    w = run(step, w, cmd_vel(v_x=1.0), 40)  # 1 s
    assert abs(float(w.robots.v_x[0]) - 1.0) < 0.02
    assert abs(float(w.robots.v_y[0])) < 0.02
    assert float(w.robots.x[0]) > -1.0 + 0.5


def test_holonomic_strafe_local_y(step):
    # theta=0 so local y == world y: pure sideways motion, no rotation
    w = world2()
    w = run(step, w, cmd_vel(v_y=1.0), 40)
    assert abs(float(w.robots.v_y[0]) - 1.0) < 0.02
    assert abs(float(w.robots.v_x[0])) < 0.02
    assert abs(float(w.robots.theta[0])) < 1e-3


def test_rotation_tracking(step):
    w = world2()
    w = run(step, w, cmd_vel(v_theta=3.0), 40)
    assert abs(float(w.robots.v_theta[0]) - 3.0) < 0.05


def test_wheel_speed_command_mode(step):
    # wheel targets equal to J @ [1,0,0]/r must produce ~1 m/s forward
    J = wheel_jacobian(FIELD)
    wheels = J @ np.array([1.0, 0.0, 0.0]) / FIELD.rbt_wheel_radius
    c = zero_ssl_commands(2)
    c = c._replace(
        wheel_speed=c.wheel_speed.at[0].set(True),
        v_wheel=c.v_wheel.at[0].set(jnp.asarray(wheels)),
    )
    w = run(step, world2(), c, 40)
    assert abs(float(w.robots.v_x[0]) - 1.0) < 0.05
    assert abs(float(w.robots.v_y[0])) < 0.05


def test_achieved_wheel_speeds_reported(step):
    w = run(step, world2(), cmd_vel(v_x=1.0), 40)
    J = wheel_jacobian(FIELD)
    expect = J @ np.array([1.0, 0.0, 0.0]) / FIELD.rbt_wheel_radius
    np.testing.assert_allclose(
        np.asarray(w.robots.v_wheel[0]), expect, atol=0.1 * np.abs(expect).max()
    )


def test_infrared_on_contact(step):
    # ball exactly at the kicker face of robot 0 (theta=0 -> face at +x)
    face = FIELD.rbt_distance_center_kicker + FIELD.ball_radius - 0.003
    w = world2(ball=(-1.0 + face, 0.0, 0.0, 0.0))
    w = step(w, cmd_vel())
    assert bool(w.robots.infrared[0])
    assert not bool(w.robots.infrared[1])


def test_no_infrared_behind_robot(step):
    face = FIELD.rbt_distance_center_kicker + FIELD.ball_radius - 0.003
    w = world2(ball=(-1.0 - face, 0.0, 0.0, 0.0))
    w = step(w, cmd_vel())
    assert not bool(w.robots.infrared[0])


def test_kick_sets_ball_speed_along_heading(step):
    face = FIELD.rbt_distance_center_kicker + FIELD.ball_radius - 0.003
    w = world2(ball=(-1.0 + face, 0.0, 0.0, 0.0))
    w = step(w, cmd_vel(kick=5.0))
    v = float(jnp.hypot(w.ball.v_x, w.ball.v_y))
    assert abs(v - 5.0) < 0.2
    assert float(w.ball.v_x) > 4.8  # along +x heading


def test_negative_kick_is_noop(step):
    face = FIELD.rbt_distance_center_kicker + FIELD.ball_radius - 0.003
    w = world2(ball=(-1.0 + face, 0.0, 0.0, 0.0))
    w = step(w, cmd_vel(kick=-5.0))
    assert float(jnp.hypot(w.ball.v_x, w.ball.v_y)) < 0.1


def test_dribbler_holds_ball_while_driving(step):
    face = FIELD.rbt_distance_center_kicker + FIELD.ball_radius - 0.003
    w = world2(ball=(-1.0 + face, 0.0, 0.0, 0.0))
    w = run(step, w, cmd_vel(v_x=0.8, dribbler=True), 60)  # 1.5 s
    # ball stays at the face: still infrared, travelled with the robot
    assert bool(w.robots.infrared[0])
    assert float(w.ball.x) > -0.5


def test_without_dribbler_ball_left_behind(step):
    face = FIELD.rbt_distance_center_kicker + FIELD.ball_radius - 0.003
    w = world2(ball=(-1.0 + face, 0.0, 0.0, 0.0))
    w = run(step, w, cmd_vel(v_x=-0.8, dribbler=False), 40)  # reverse away
    assert not bool(w.robots.infrared[0])


def _ball_at_face():
    face = FIELD.rbt_distance_center_kicker + FIELD.ball_radius - 0.003
    return world2(ball=(-1.0 + face, 0.0, 0.0, 0.0))


def test_chip_kick_sets_vertical_velocity(step):
    """kick_v_z launches the ball (reference command slot rsim.py:147)."""
    w = step(_ball_at_face(), cmd_vel(kick=3.0, kick_z=2.5))
    # after one control step gravity has shaved <= g*dt off the launch speed
    assert float(w.ball.v_z) > 2.5 - SSL_PHYSICS.gravity * DT - 1e-3
    assert float(w.ball.z) > FIELD.ball_radius
    assert float(w.ball.v_x) > 2.8  # horizontal component intact


def test_chip_kick_apex_matches_ballistic_closed_form(step):
    v_z0 = 2.0
    w = step(_ball_at_face(), cmd_vel(kick=1.0, kick_z=v_z0))
    apex = float(w.ball.z)
    for _ in range(40):
        w = step(w, cmd_vel())
        apex = max(apex, float(w.ball.z))
    expect = FIELD.ball_radius + v_z0**2 / (2.0 * SSL_PHYSICS.gravity)
    # discretisation error ~ v_z*dt_sub per substep
    assert abs(apex - expect) < 0.03, (apex, expect)


def test_chip_kick_range_matches_ballistic_closed_form(step):
    v_x0, v_z0 = 2.0, 3.0
    w0 = _ball_at_face()
    x0 = float(w0.ball.x)
    w = step(w0, cmd_vel(kick=v_x0, kick_z=v_z0))
    # first flight: range to first floor touch = v_x * 2 v_z / g (no air
    # friction while airborne)
    t_flight = 2.0 * v_z0 / SSL_PHYSICS.gravity
    steps_needed = int(t_flight / DT) + 2
    landed_x = None
    for _ in range(steps_needed + 10):
        prev_vz = float(w.ball.v_z)
        w = step(w, cmd_vel())
        # the floor bounce flips v_z inside a substep — detect the sign flip
        if prev_vz < 0.0 <= float(w.ball.v_z):
            landed_x = float(w.ball.x)
            break
    assert landed_x is not None
    expect = x0 + v_x0 * t_flight
    # tolerance: one control step of horizontal travel + discretisation
    assert abs(landed_x - expect) < v_x0 * DT + 0.05, (landed_x, expect)


def test_airborne_ball_flies_over_robot(step):
    # ball launched high enough clears a robot standing in its path
    blocker_x = 0.0
    w = world2(r0=(-1.0, 0.0, 0.0), r1=(blocker_x, 0.0, 0.0))
    w = w._replace(
        ball=w.ball._replace(
            x=jnp.asarray(-0.5), y=jnp.asarray(0.0),
            z=jnp.asarray(SSL_PHYSICS.rbt_height + FIELD.ball_radius + 0.15),
            v_x=jnp.asarray(3.0), v_z=jnp.asarray(1.5),
        )
    )
    w = run(step, w, cmd_vel(), 8)  # 0.2 s: crosses the blocker airborne
    assert float(w.ball.x) > blocker_x + FIELD.rbt_radius  # passed through
    assert float(w.ball.v_x) == pytest.approx(3.0, abs=1e-5)  # untouched


def test_flying_ball_does_not_trigger_infrared(step):
    w = _ball_at_face()
    w = w._replace(
        ball=w.ball._replace(
            z=jnp.asarray(SSL_PHYSICS.kicker_height + FIELD.ball_radius + 0.05)
        )
    )
    w = step(w, cmd_vel())
    assert not bool(w.robots.infrared[0])


def test_grounded_ball_settles_and_rolls_with_friction(step):
    # a dropped ball bounces with restitution then settles at z = radius
    w = world2()
    w = w._replace(
        ball=w.ball._replace(z=jnp.asarray(0.5), v_x=jnp.asarray(1.0))
    )
    for _ in range(80):  # 2 s
        w = step(w, cmd_vel())
    assert float(w.ball.z) == pytest.approx(FIELD.ball_radius, abs=1e-5)
    assert float(w.ball.v_z) == 0.0


def test_no_walls_ball_leaves_field(step):
    w = world2(ball=(FIELD.half_length - 0.1, 0.5, 2.0, 0.0))
    w = run(step, w, cmd_vel(), 40)
    assert float(w.ball.x) > FIELD.half_length  # crossed the line freely
