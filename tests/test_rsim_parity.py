"""Physics parity against real rSim trajectories — executable when available.

The rSim engine (``robosim``) is the reference's out-of-repo C++ dynamics
(reference Simulators/rsim.py:2); it is not installed in this image, so this
module SKIPS cleanly.  The moment either

  * a ``robosim`` wheel is importable, or
  * a recorded fixture ``tests/golden/rsim_vss.npz`` exists
    (see tools/record_rsim.py)

these tests run for real: they teacher-force our VSS step along the recorded
rSim trajectories, bound the one-step divergence, and verify the calibration
harness (tools/calibrate.py) strictly reduces it.  This is the executable
form of the fidelity contract documented in docs/fidelity.md.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "golden", "rsim_vss.npz")


def _have_robosim():
    try:
        import robosim  # noqa: F401

        return True
    except ImportError:
        return False


if not (_have_robosim() or os.path.exists(FIXTURE)):
    pytest.skip(
        "neither robosim nor a recorded rsim_vss.npz fixture is available",
        allow_module_level=True,
    )

import jax.numpy as jnp  # noqa: E402

from rsoccer_tpu.core.field import vss_field  # noqa: E402
from rsoccer_tpu.core.state import VSSCommands, make_world  # noqa: E402
from rsoccer_tpu.physics.config import VSS_PHYSICS  # noqa: E402
from rsoccer_tpu.physics.vss import make_vss_step  # noqa: E402

BALL_FLOATS = 5
ROBOT_FLOATS = 6


@pytest.fixture(scope="module")
def recording():
    if not os.path.exists(FIXTURE):
        # robosim is present but nothing recorded yet: record a small run
        from tools.record_rsim import record_vss

        states, commands, meta = record_vss(n_episodes=4, n_steps=100)
        np.savez_compressed(FIXTURE, states=states, commands=commands, **meta)
    data = np.load(FIXTURE)
    return data


def _world_from_flat(flat, n):
    """rSim flat VSS state (Entities/Frame.py:18-49) -> WorldState.

    Layout: ball x,y,z,v_x,v_y then per robot x,y,theta_deg,v_x,v_y,
    v_theta_deg, blues first.  rSim reports angles in degrees; our state is
    radians.
    """
    w = make_world(n)
    rb = flat[BALL_FLOATS:].reshape(n, ROBOT_FLOATS)
    return w._replace(
        ball=w.ball._replace(
            x=jnp.asarray(flat[0], jnp.float32),
            y=jnp.asarray(flat[1], jnp.float32),
            z=jnp.asarray(max(float(flat[2]), 0.0215), jnp.float32),
            v_x=jnp.asarray(flat[3], jnp.float32),
            v_y=jnp.asarray(flat[4], jnp.float32),
        ),
        robots=w.robots._replace(
            x=jnp.asarray(rb[:, 0], jnp.float32),
            y=jnp.asarray(rb[:, 1], jnp.float32),
            theta=jnp.asarray(np.radians((rb[:, 2] + 180.0) % 360.0 - 180.0), jnp.float32),
            v_x=jnp.asarray(rb[:, 3], jnp.float32),
            v_y=jnp.asarray(rb[:, 4], jnp.float32),
            v_theta=jnp.asarray(np.radians(rb[:, 5]), jnp.float32),
        ),
    )


def _one_step_position_error(step, states, commands, n):
    """Mean |pos_pred - pos_rsim| (m) over all one-step transitions."""
    errs = []
    E, T1, _ = states.shape
    for ep in range(E):
        for t in range(T1 - 1):
            w = _world_from_flat(states[ep, t], n)
            cmd = VSSCommands(
                v_wheel0=jnp.asarray(commands[ep, t, :, 0], jnp.float32),
                v_wheel1=jnp.asarray(commands[ep, t, :, 1], jnp.float32),
            )
            pred = step(w, cmd)
            tgt = _world_from_flat(states[ep, t + 1], n)
            errs.append(
                np.mean(
                    np.abs(
                        np.concatenate(
                            [
                                np.atleast_1d(np.asarray(pred.ball.x - tgt.ball.x)),
                                np.atleast_1d(np.asarray(pred.ball.y - tgt.ball.y)),
                                np.asarray(pred.robots.x - tgt.robots.x),
                                np.asarray(pred.robots.y - tgt.robots.y),
                            ]
                        )
                    )
                )
            )
    return float(np.mean(errs))


def test_one_step_divergence_bounded(recording):
    n = int(recording["n_blue"]) + int(recording["n_yellow"])
    field = vss_field(int(recording["field_type"]))
    step = make_vss_step(field, VSS_PHYSICS, float(recording["dt"]))
    err = _one_step_position_error(
        step, recording["states"][:2, :50], recording["commands"][:2, :49], n
    )
    # Uncalibrated spec vs real rSim over one 25 ms tick: positions must stay
    # within 2 cm on average (a motor-model mismatch shows up here long
    # before a unit/geometry/contract mismatch would)
    assert err < 0.02, f"one-step position divergence vs rSim: {err * 1000:.1f} mm"


def test_calibration_reduces_divergence(recording):
    import jax

    from tools.calibrate import fit_vss_physics

    n = int(recording["n_blue"]) + int(recording["n_yellow"])
    field = vss_field(int(recording["field_type"]))
    dt = float(recording["dt"])

    # stack one episode into the pytree layout fit_vss_physics consumes
    ep_states = [
        _world_from_flat(recording["states"][0, t], n)
        for t in range(recording["states"].shape[1])
    ]
    states = jax.tree.map(lambda *ls: jnp.stack(ls), *ep_states)
    commands = VSSCommands(
        v_wheel0=jnp.asarray(recording["commands"][0, :, :, 0], jnp.float32),
        v_wheel1=jnp.asarray(recording["commands"][0, :, :, 1], jnp.float32),
    )

    step0 = make_vss_step(field, VSS_PHYSICS, dt)
    before = _one_step_position_error(
        step0, recording["states"][:1, :30], recording["commands"][:1, :29], n
    )
    fitted, losses = fit_vss_physics(states, commands, field, dt, n_iters=150)
    step1 = make_vss_step(field, fitted, dt)
    after = _one_step_position_error(
        step1, recording["states"][:1, :30], recording["commands"][:1, :29], n
    )
    assert losses[-1] < losses[0], "calibration loss did not decrease"
    assert after <= before * 1.05, (
        f"calibration made divergence worse: {before * 1000:.2f} -> "
        f"{after * 1000:.2f} mm"
    )
