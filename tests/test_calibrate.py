"""Differentiable physics calibration recovers known coefficients."""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rsoccer_tpu.core.field import vss_field
from rsoccer_tpu.core.state import VSSCommands, make_world
from rsoccer_tpu.physics.config import VSS_PHYSICS
from rsoccer_tpu.physics.vss import make_vss_step
from tools.calibrate import fit_vss_physics


def _trajectory(T=60):
    field = vss_field(0)
    step = make_vss_step(field, VSS_PHYSICS, 0.025)
    key = jax.random.PRNGKey(0)
    w = make_world(6)
    w = w._replace(
        ball=w.ball._replace(
            x=jnp.asarray(0.1), y=jnp.asarray(0.1),
            v_x=jnp.asarray(0.8), v_y=jnp.asarray(-0.4),
        ),
        robots=w.robots._replace(
            x=jnp.linspace(-0.6, 0.4, 6), y=jnp.linspace(-0.4, 0.4, 6),
            theta=jnp.linspace(0.0, 3.0, 6),
        ),
    )
    cmds, states = [], [w]
    for _ in range(T):
        key, k = jax.random.split(key)
        c = VSSCommands(*jax.random.uniform(k, (2, 6), minval=-30, maxval=30))
        w = step(w, c)
        cmds.append(c)
        states.append(w)
    stack = lambda *ls: jnp.stack(ls)
    return (
        jax.tree.map(stack, *states),
        jax.tree.map(stack, *cmds),
        field,
    )


def test_recovers_perturbed_coefficients():
    states, cmds, field = _trajectory()
    bad = dataclasses.replace(
        VSS_PHYSICS,
        robot_accel=VSS_PHYSICS.robot_accel * 2.5,
        ball_friction_decel=VSS_PHYSICS.ball_friction_decel * 3.0,
    )
    fitted, losses = fit_vss_physics(
        states, cmds, field, 0.025, init_cfg=bad, n_iters=200
    )
    assert losses[-1] < losses[0] * 1e-3
    assert abs(float(fitted.robot_accel) - VSS_PHYSICS.robot_accel) < 0.3
    assert (
        abs(float(fitted.ball_friction_decel) - VSS_PHYSICS.ball_friction_decel)
        < 0.1
    )


def test_gradients_finite_through_resting_ball():
    # a world with the ball exactly at rest must yield finite grads
    field = vss_field(0)

    def loss(decel):
        cfg = dataclasses.replace(VSS_PHYSICS, ball_friction_decel=decel)
        step = make_vss_step(field, cfg, 0.025)
        w = make_world(2)
        w2 = step(w, VSSCommands(jnp.zeros(2), jnp.zeros(2)))
        return w2.ball.x**2 + w2.ball.v_x**2

    g = jax.grad(loss)(0.6)
    assert jnp.isfinite(g)
