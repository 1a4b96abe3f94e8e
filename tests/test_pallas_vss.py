"""Pallas fused physics kernel vs the XLA step (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsoccer_tpu.core.field import vss_field
from rsoccer_tpu.core.state import BallState, RobotsState, VSSCommands, WorldState
from rsoccer_tpu.ops.pallas_vss import make_pallas_vss_physics
from rsoccer_tpu.physics.config import VSS_PHYSICS
from rsoccer_tpu.physics.vss import make_vss_step

FIELD = vss_field(0)
DT = 0.025
N = 6
B = 16


def random_batched_world(rng):
    rb = np.zeros((6, N, B), np.float32)
    rb[0] = rng.uniform(-0.6, 0.6, (N, B))
    rb[1] = rng.uniform(-0.5, 0.5, (N, B))
    rb[2] = rng.uniform(-np.pi, np.pi, (N, B))
    rb[3:5] = rng.uniform(-0.5, 0.5, (2, N, B))
    rb[5] = rng.uniform(-5, 5, (N, B))
    ball = np.zeros((6, B), np.float32)
    ball[0] = rng.uniform(-0.6, 0.6, B)
    ball[1] = rng.uniform(-0.5, 0.5, B)
    # half the lanes airborne so the vertical path is exercised
    airborne = rng.uniform(size=B) < 0.5
    ball[2] = FIELD.ball_radius + np.where(airborne, rng.uniform(0, 0.3, B), 0.0)
    ball[3:5] = rng.uniform(-1, 1, (2, B))
    ball[5] = np.where(airborne, rng.uniform(-1, 2, B), 0.0)
    cmds = rng.uniform(-40, 40, (2, N, B)).astype(np.float32)
    return jnp.asarray(rb), jnp.asarray(ball), jnp.asarray(cmds)


def xla_reference(rb, ball, cmds):
    """Run the production (vmapped) XLA step on the same batch."""
    step = make_vss_step(FIELD, VSS_PHYSICS, DT)

    def single(rb_i, ball_i, cmd_i):
        world = WorldState(
            ball=BallState(*[ball_i[k] for k in range(6)]),
            robots=RobotsState(
                x=rb_i[0], y=rb_i[1], theta=rb_i[2],
                v_x=rb_i[3], v_y=rb_i[4], v_theta=rb_i[5],
                infrared=jnp.zeros((N,), bool),
                v_wheel=jnp.zeros((N, 4)),
            ),
        )
        w = step(world, VSSCommands(cmd_i[0], cmd_i[1]))
        out_rb = jnp.stack(
            [w.robots.x, w.robots.y, w.robots.theta,
             w.robots.v_x, w.robots.v_y, w.robots.v_theta]
        )
        out_ball = jnp.stack(
            [w.ball.x, w.ball.y, w.ball.z, w.ball.v_x, w.ball.v_y, w.ball.v_z]
        )
        return out_rb, out_ball

    return jax.vmap(single, in_axes=-1, out_axes=-1)(rb, ball, cmds)


def test_pallas_matches_xla_step():
    kernel = make_pallas_vss_physics(
        FIELD, VSS_PHYSICS, DT, n_robots=N, batch=B, tile=B, interpret=True
    )
    rng = np.random.default_rng(0)
    for trial in range(5):
        rb, ball, cmds = random_batched_world(rng)
        p_rb, p_ball = kernel(rb, ball, cmds)
        x_rb, x_ball = xla_reference(rb, ball, cmds)
        np.testing.assert_allclose(
            np.asarray(p_rb), np.asarray(x_rb), atol=2e-4,
            err_msg=f"trial {trial} robots",
        )
        np.testing.assert_allclose(
            np.asarray(p_ball), np.asarray(x_ball), atol=2e-4,
            err_msg=f"trial {trial} ball",
        )


def test_pallas_trajectory_stable():
    kernel = make_pallas_vss_physics(
        FIELD, VSS_PHYSICS, DT, n_robots=N, batch=B, tile=B, interpret=True
    )
    rng = np.random.default_rng(1)
    rb, ball, cmds = random_batched_world(rng)
    for _ in range(20):
        rb, ball = kernel(rb, ball, cmds)
    assert bool(jnp.isfinite(rb).all()) and bool(jnp.isfinite(ball).all())
    # robots stay in the walls
    assert float(jnp.abs(rb[0]).max()) <= FIELD.half_length
    assert float(jnp.abs(rb[1]).max()) <= FIELD.half_width


def test_pallas_batched_env_matches_default():
    """The pallas-physics BatchedEnv path must reproduce the default path
    given the same noise (interpret mode on CPU)."""
    import rsoccer_tpu
    from rsoccer_tpu.batch.vecenv import BatchedEnv
    import rsoccer_tpu.ops.pallas_vss as pv
    import functools

    # force interpret mode for CPU
    orig = pv.make_pallas_vss_physics
    pv_patched = functools.partial(orig, interpret=True)
    pv.make_pallas_vss_physics = pv_patched
    try:
        env = rsoccer_tpu.make("VSS-v0")
        Bn = 8
        benv_ref = BatchedEnv(env, Bn)
        benv_pal = BatchedEnv(env, Bn, pallas_physics=True, pallas_tile=Bn)
        key = jax.random.PRNGKey(0)
        s_ref, o_ref = benv_ref.reset(key)
        s_pal, o_pal = benv_pal.reset(key)
        np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_pal), atol=1e-6)
        acts = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (2, Bn)), jnp.float32
        )
        for t in range(5):
            k = jax.random.PRNGKey(10 + t)
            s_ref, o_ref, r_ref, te_ref, tr_ref, i_ref = benv_ref.step(s_ref, acts, k)
            s_pal, o_pal, r_pal, te_pal, tr_pal, i_pal = benv_pal.step(s_pal, acts, k)
            np.testing.assert_allclose(
                np.asarray(o_ref), np.asarray(o_pal), atol=5e-4,
                err_msg=f"obs diverged at step {t}",
            )
            np.testing.assert_allclose(
                np.asarray(r_ref), np.asarray(r_pal), atol=5e-4,
                err_msg=f"reward diverged at step {t}",
            )
            np.testing.assert_array_equal(np.asarray(te_ref), np.asarray(te_pal))
    finally:
        pv.make_pallas_vss_physics = orig
