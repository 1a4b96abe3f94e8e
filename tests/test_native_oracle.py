"""Cross-validation: the C++ oracle and the JAX VSS kernel implement the same
physics spec — they must agree to vector-math tolerance on random worlds."""

import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from rsoccer_tpu.core.field import vss_field
from rsoccer_tpu.core.state import BallState, RobotsState, VSSCommands, WorldState
from rsoccer_tpu.physics.config import VSS_PHYSICS
from rsoccer_tpu.physics.vss import make_vss_step

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)

FIELD = vss_field(0)
DT = 0.025


def random_world(rng, n=6):
    # ball = {x, y, z, vx, vy, vz}; occasionally airborne with vertical
    # velocity so the z-axis path is exercised too
    airborne = rng.uniform() < 0.5
    ball = np.array(
        [rng.uniform(-0.6, 0.6), rng.uniform(-0.5, 0.5),
         FIELD.ball_radius + (rng.uniform(0.0, 0.3) if airborne else 0.0),
         rng.uniform(-1, 1), rng.uniform(-1, 1),
         rng.uniform(-1, 2) if airborne else 0.0],
        np.float32,
    )
    robots = np.zeros((n, 6), np.float32)
    robots[:, 0] = rng.uniform(-0.6, 0.6, n)
    robots[:, 1] = rng.uniform(-0.5, 0.5, n)
    robots[:, 2] = rng.uniform(-np.pi, np.pi, n)
    robots[:, 3:5] = rng.uniform(-0.5, 0.5, (n, 2))
    robots[:, 5] = rng.uniform(-5, 5, n)
    return ball, robots


def jax_world(ball, robots):
    n = robots.shape[0]
    return WorldState(
        ball=BallState(
            x=jnp.asarray(ball[0]), y=jnp.asarray(ball[1]),
            z=jnp.asarray(ball[2]),
            v_x=jnp.asarray(ball[3]), v_y=jnp.asarray(ball[4]),
            v_z=jnp.asarray(ball[5]),
        ),
        robots=RobotsState(
            x=jnp.asarray(robots[:, 0]), y=jnp.asarray(robots[:, 1]),
            theta=jnp.asarray(robots[:, 2]), v_x=jnp.asarray(robots[:, 3]),
            v_y=jnp.asarray(robots[:, 4]), v_theta=jnp.asarray(robots[:, 5]),
            infrared=jnp.zeros((n,), bool), v_wheel=jnp.zeros((n, 4)),
        ),
    )


def test_oracle_matches_jax_step():
    from rsoccer_tpu.ops.native import vss_step_native

    step = make_vss_step(FIELD, VSS_PHYSICS, DT)
    rng = np.random.default_rng(0)
    for trial in range(20):
        ball, robots = random_world(rng)
        cmds = rng.uniform(-40, 40, (6, 2)).astype(np.float32)

        w = jax_world(ball, robots)
        w2 = step(w, VSSCommands(jnp.asarray(cmds[:, 0]), jnp.asarray(cmds[:, 1])))

        b_c, r_c = ball.copy(), robots.copy()
        vss_step_native(FIELD, VSS_PHYSICS, DT, b_c, r_c, cmds)

        np.testing.assert_allclose(
            b_c,
            np.array([w2.ball.x, w2.ball.y, w2.ball.z,
                      w2.ball.v_x, w2.ball.v_y, w2.ball.v_z]),
            atol=2e-4, err_msg=f"trial {trial} ball",
        )
        got = np.stack(
            [w2.robots.x, w2.robots.y, w2.robots.theta,
             w2.robots.v_x, w2.robots.v_y, w2.robots.v_theta], axis=-1
        )
        np.testing.assert_allclose(
            r_c, got, atol=2e-4, err_msg=f"trial {trial} robots"
        )


def test_oracle_matches_over_trajectory():
    from rsoccer_tpu.ops.native import vss_step_native

    step = make_vss_step(FIELD, VSS_PHYSICS, DT)
    rng = np.random.default_rng(1)
    ball, robots = random_world(rng)
    cmds = rng.uniform(-30, 30, (6, 2)).astype(np.float32)
    w = jax_world(ball, robots)
    b_c, r_c = ball.copy(), robots.copy()
    for t in range(40):  # 1 s of simulation
        w = step(w, VSSCommands(jnp.asarray(cmds[:, 0]), jnp.asarray(cmds[:, 1])))
        vss_step_native(FIELD, VSS_PHYSICS, DT, b_c, r_c, cmds)
    np.testing.assert_allclose(
        b_c[:2], np.array([w.ball.x, w.ball.y]), atol=5e-3
    )
    np.testing.assert_allclose(
        r_c[:, :2], np.stack([w.robots.x, w.robots.y], -1), atol=5e-3
    )


# ---------------------------------------------------------------------------
# SSL oracle (csrc/ssl_physics.cpp) vs the JAX SSL kernel
# ---------------------------------------------------------------------------

from rsoccer_tpu.core.field import ssl_field
from rsoccer_tpu.core.state import SSLCommands
from rsoccer_tpu.physics.config import SSL_PHYSICS
from rsoccer_tpu.physics.ssl import make_ssl_step

SSL_FIELD = ssl_field(2)


def random_ssl_commands(rng, n):
    """(N, 11) native layout + the equivalent SSLCommands pytree."""
    cmds = np.zeros((n, 11), np.float32)
    cmds[:, 0] = (rng.uniform(size=n) < 0.5).astype(np.float32)
    cmds[:, 1:5] = rng.uniform(-30, 30, (n, 4))
    cmds[:, 5:7] = rng.uniform(-2, 2, (n, 2))
    cmds[:, 7] = rng.uniform(-8, 8, n)
    cmds[:, 8] = rng.uniform(-2, 5, n)  # kick_v_x, sometimes <= 0 (no kick)
    cmds[:, 9] = rng.uniform(0, 3, n) * (rng.uniform(size=n) < 0.3)
    cmds[:, 10] = (rng.uniform(size=n) < 0.5).astype(np.float32)
    tree = SSLCommands(
        wheel_speed=jnp.asarray(cmds[:, 0] > 0.5),
        v_wheel=jnp.asarray(cmds[:, 1:5]),
        v_x=jnp.asarray(cmds[:, 5]),
        v_y=jnp.asarray(cmds[:, 6]),
        v_theta=jnp.asarray(cmds[:, 7]),
        kick_v_x=jnp.asarray(cmds[:, 8]),
        kick_v_z=jnp.asarray(cmds[:, 9]),
        dribbler=jnp.asarray(cmds[:, 10] > 0.5),
    )
    return cmds, tree


def random_ssl_world(rng, n=7):
    airborne = rng.uniform() < 0.3
    ball = np.array(
        [rng.uniform(-2, 2), rng.uniform(-1.5, 1.5),
         SSL_FIELD.ball_radius + (rng.uniform(0.0, 0.2) if airborne else 0.0),
         rng.uniform(-2, 2), rng.uniform(-2, 2),
         rng.uniform(-1, 2) if airborne else 0.0],
        np.float32,
    )
    robots = np.zeros((n, 6), np.float32)
    robots[:, 0] = rng.uniform(-2, 2, n)
    robots[:, 1] = rng.uniform(-1.5, 1.5, n)
    robots[:, 2] = rng.uniform(-np.pi, np.pi, n)
    robots[:, 3:5] = rng.uniform(-1, 1, (n, 2))
    robots[:, 5] = rng.uniform(-6, 6, n)
    return ball, robots


def jax_ssl_world(ball, robots):
    n = robots.shape[0]
    return WorldState(
        ball=BallState(
            x=jnp.asarray(ball[0]), y=jnp.asarray(ball[1]),
            z=jnp.asarray(ball[2]),
            v_x=jnp.asarray(ball[3]), v_y=jnp.asarray(ball[4]),
            v_z=jnp.asarray(ball[5]),
        ),
        robots=RobotsState(
            x=jnp.asarray(robots[:, 0]), y=jnp.asarray(robots[:, 1]),
            theta=jnp.asarray(robots[:, 2]), v_x=jnp.asarray(robots[:, 3]),
            v_y=jnp.asarray(robots[:, 4]), v_theta=jnp.asarray(robots[:, 5]),
            infrared=jnp.zeros((n,), bool), v_wheel=jnp.zeros((n, 4)),
        ),
    )


def test_ssl_oracle_matches_jax_step():
    from rsoccer_tpu.ops.native import ssl_step_native

    step = make_ssl_step(SSL_FIELD, SSL_PHYSICS, DT)
    rng = np.random.default_rng(7)
    for trial in range(20):
        ball, robots = random_ssl_world(rng)
        cmds, tree = random_ssl_commands(rng, robots.shape[0])

        w = jax_ssl_world(ball, robots)
        w2 = step(w, tree)

        b_c, r_c = ball.copy(), robots.copy()
        ir, wheels = ssl_step_native(SSL_FIELD, SSL_PHYSICS, DT, b_c, r_c, cmds)

        np.testing.assert_allclose(
            b_c,
            np.array([w2.ball.x, w2.ball.y, w2.ball.z,
                      w2.ball.v_x, w2.ball.v_y, w2.ball.v_z]),
            atol=2e-4, err_msg=f"trial {trial} ball",
        )
        got = np.stack(
            [w2.robots.x, w2.robots.y, w2.robots.theta,
             w2.robots.v_x, w2.robots.v_y, w2.robots.v_theta], axis=-1
        )
        np.testing.assert_allclose(
            r_c, got, atol=2e-4, err_msg=f"trial {trial} robots"
        )
        np.testing.assert_array_equal(
            ir, np.asarray(w2.robots.infrared), err_msg=f"trial {trial} ir"
        )
        np.testing.assert_allclose(
            wheels, np.asarray(w2.robots.v_wheel), atol=5e-3,
            err_msg=f"trial {trial} wheels",
        )


def test_ssl_oracle_matches_over_trajectory():
    from rsoccer_tpu.ops.native import ssl_step_native

    step = make_ssl_step(SSL_FIELD, SSL_PHYSICS, DT)
    rng = np.random.default_rng(8)
    ball, robots = random_ssl_world(rng)
    cmds, tree = random_ssl_commands(rng, robots.shape[0])
    w = jax_ssl_world(ball, robots)
    b_c, r_c = ball.copy(), robots.copy()
    for t in range(40):  # 1 s of simulation
        w = step(w, tree)
        ssl_step_native(SSL_FIELD, SSL_PHYSICS, DT, b_c, r_c, cmds)
    np.testing.assert_allclose(
        b_c[:2], np.array([w.ball.x, w.ball.y]), atol=5e-3
    )
    np.testing.assert_allclose(
        r_c[:, :2], np.stack([w.robots.x, w.robots.y], -1), atol=5e-3
    )
