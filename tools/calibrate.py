"""Differentiable calibration of physics coefficients against trajectories.

The reference's dynamics coefficients live inside the out-of-repo rSim C++
binary; ours are a documented spec (physics/config.py).  When golden
trajectories from a real rSim install (or robot logs) are available, this
harness fits our coefficients to them by gradient descent THROUGH the
physics step — the step is pure jnp, so ``jax.grad`` flows through motor
response, friction, and (sub-gradient) collision branches.

Usage (library):

    from tools.calibrate import fit_vss_physics
    fitted_cfg, losses = fit_vss_physics(states, commands, field, dt)

where ``states`` is a (T+1, ...) pytree of WorldStates (stacked leaves) and
``commands`` a (T, ...) stack of VSSCommands; the loss is one-step
teacher-forced prediction error.

Also runnable as a self-test that recovers known coefficients from synthetic
trajectories:  python tools/calibrate.py
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from rsoccer_tpu.core.field import FieldParams, vss_field
from rsoccer_tpu.core.state import VSSCommands, make_world
from rsoccer_tpu.physics.config import PhysicsConfig, VSS_PHYSICS
from rsoccer_tpu.physics.vss import make_vss_step

# coefficients the fit adjusts, with physical bounds (restitutions must stay
# below 1 or the dynamics are energy-gaining and the loss explodes)
TUNABLE_BOUNDS = {
    "robot_accel": (1e-2, 1e3),
    "robot_alpha": (1e-1, 1e4),
    "lateral_decay": (1e-1, 1e3),
    "ball_friction_decel": (1e-3, 1e2),
    "rest_ball_wall": (1e-2, 0.99),
    "rest_ball_robot": (1e-2, 0.99),
}
TUNABLE = tuple(TUNABLE_BOUNDS)


def _to_raw(cfg: PhysicsConfig):
    # log-space parameterisation: positive-constrained and well-conditioned
    # across the 0.1..200 coefficient range
    return {k: jnp.log(jnp.asarray(getattr(cfg, k))) for k in TUNABLE}


def _to_cfg(raw, base: PhysicsConfig) -> PhysicsConfig:
    vals = {k: jnp.exp(v) for k, v in raw.items()}
    return dataclasses.replace(base, **vals)


def _state_error(pred, target):
    err = 0.0
    for a, b in zip(jax.tree.leaves(pred), jax.tree.leaves(target)):
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        err = err + jnp.mean((a - b) ** 2)
    return err


def fit_vss_physics(
    states,
    commands,
    field: FieldParams,
    dt: float,
    init_cfg: PhysicsConfig = VSS_PHYSICS,
    n_iters: int = 300,
    lr: float = 0.05,
):
    """One-step teacher-forced fit.  Returns (fitted PhysicsConfig, losses)."""

    def loss_fn(raw):
        cfg = _to_cfg(raw, init_cfg)
        step = make_vss_step(field, cfg, dt)

        def one(t_state, t_cmd, t_next):
            return _state_error(step(t_state, t_cmd), t_next)

        cur = jax.tree.map(lambda l: l[:-1], states)
        nxt = jax.tree.map(lambda l: l[1:], states)
        errs = jax.vmap(one)(cur, commands, nxt)
        return jnp.mean(errs)

    raw = _to_raw(init_cfg)
    tx = optax.adam(lr)
    opt = tx.init(raw)
    losses = []

    bounds = {
        k: (jnp.log(lo), jnp.log(hi)) for k, (lo, hi) in TUNABLE_BOUNDS.items()
    }

    @jax.jit
    def update(raw, opt):
        loss, grads = jax.value_and_grad(loss_fn)(raw)
        # NaN-guard: skip a step whose gradient is non-finite (collision
        # sub-gradients can spike at contact boundaries)
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        upd, opt = tx.update(grads, opt)
        raw = optax.apply_updates(raw, upd)
        # per-coefficient physical windows
        raw = {k: jnp.clip(v, *bounds[k]) for k, v in raw.items()}
        return raw, opt, loss

    for i in range(n_iters):
        raw, opt, loss = update(raw, opt)
        losses.append(float(loss))
    return _to_cfg(raw, init_cfg), losses


def _synthetic_selftest():
    """Recover perturbed coefficients from a synthetic trajectory."""
    field = vss_field(0)
    dt = 0.025
    true_cfg = VSS_PHYSICS
    step = make_vss_step(field, true_cfg, dt)

    # build an informative trajectory: robots driving, ball rolling
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
    T = 80
    cmds, states = [], [w]
    for t in range(T):
        key, k = jax.random.split(key)
        c = VSSCommands(*jax.random.uniform(k, (2, 6), minval=-30, maxval=30))
        w = step(w, c)
        cmds.append(c)
        states.append(w)
    states = jax.tree.map(lambda *ls: jnp.stack(ls), *states)
    cmds = jax.tree.map(lambda *ls: jnp.stack(ls), *cmds)

    # start from badly perturbed coefficients
    bad = dataclasses.replace(
        true_cfg,
        robot_accel=true_cfg.robot_accel * 2.5,
        lateral_decay=true_cfg.lateral_decay * 0.4,
        ball_friction_decel=true_cfg.ball_friction_decel * 3.0,
    )
    fitted, losses = fit_vss_physics(states, cmds, field, dt, init_cfg=bad)
    print(f"loss: {losses[0]:.3e} -> {losses[-1]:.3e}")
    for k in TUNABLE:
        print(
            f"  {k:22s} true {getattr(true_cfg, k):8.3f}  "
            f"start {getattr(bad, k):8.3f}  fitted {float(getattr(fitted, k)):8.3f}"
        )
    return true_cfg, fitted, losses


if __name__ == "__main__":
    _synthetic_selftest()
