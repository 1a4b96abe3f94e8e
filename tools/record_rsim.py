"""Record golden trajectories from a real rSim (``robosim``) install.

The reference delegates all dynamics to the out-of-repo rSim C++ engine
(reference Simulators/rsim.py:2 ``import robosim``).  This image does not
ship that binary, so physics fidelity is documented as a spec
(docs/fidelity.md) — but the moment a ``robosim`` wheel is available, this
tool records the trajectories that make fidelity *executable*:

    python tools/record_rsim.py --out tests/golden/rsim_vss.npz

The npz uses rSim's own flat-state layout (reference Entities/Frame.py:18-49:
5 ball floats ``x,y,z,v_x,v_y`` then 6 per robot ``x,y,theta_deg,v_x,v_y,
v_theta_deg``, blues first) so the recording is a direct transcript of the
binding contract:

    states    (E, T+1, 5 + 6*n)  float64   per-episode state rollouts
    commands  (E, T,   n, 2)     float64   wheel rad/s fed to ``step``
    meta: field_type, n_blue, n_yellow, dt

Consumers: ``tests/test_rsim_parity.py`` (divergence bound + calibration)
and ``tools/calibrate.py`` (gradient fit of physics/config.py coefficients).
"""

from __future__ import annotations

import argparse

import numpy as np

VSS_BALL_FLOATS = 5
VSS_ROBOT_FLOATS = 6


def record_vss(
    n_episodes: int = 8,
    n_steps: int = 200,
    field_type: int = 0,
    n_blue: int = 3,
    n_yellow: int = 3,
    time_step_ms: int = 25,
    seed: int = 0,
    max_wheel_rad_s: float = 50.0,
):
    """Roll ``robosim.VSS`` under random piecewise-constant wheel commands.

    Episodes start from the binding's reset contract (reference
    rsim.py:36-38,52-75): ball ``[x, y, v_x, v_y]`` and per-robot
    ``[x, y, theta_deg]`` placements drawn uniformly inside the field.
    """
    import robosim  # noqa: F401 — hard requirement, caller gates on this

    rng = np.random.default_rng(seed)
    n = n_blue + n_yellow

    sim = robosim.VSS(
        field_type,
        n_blue,
        n_yellow,
        time_step_ms,
        [0, 0, 0, 0],
        [[-0.2 * i, 0, 0] for i in range(1, n_blue + 1)],
        [[0.2 * i, 0, 0] for i in range(1, n_yellow + 1)],
    )
    params = sim.get_field_params()
    half_len = params["length"] / 2 - 0.1
    half_wid = params["width"] / 2 - 0.1

    states = np.zeros((n_episodes, n_steps + 1, VSS_BALL_FLOATS + VSS_ROBOT_FLOATS * n))
    commands = np.zeros((n_episodes, n_steps, n, 2))

    for ep in range(n_episodes):
        ball = [rng.uniform(-half_len, half_len), rng.uniform(-half_wid, half_wid), 0, 0]
        place = lambda: [  # noqa: E731
            rng.uniform(-half_len, half_len),
            rng.uniform(-half_wid, half_wid),
            rng.uniform(0, 360),
        ]
        sim.reset(
            np.array(ball),
            np.array([place() for _ in range(n_blue)]),
            np.array([place() for _ in range(n_yellow)]),
        )
        states[ep, 0] = sim.get_state()
        # piecewise-constant commands (held 10 steps) excite both the motor
        # transient and steady-state regimes the calibration needs
        for t in range(n_steps):
            if t % 10 == 0:
                cmd = rng.uniform(-max_wheel_rad_s, max_wheel_rad_s, size=(n, 2))
            commands[ep, t] = cmd
            sim.step(cmd)
            states[ep, t + 1] = sim.get_state()

    meta = dict(
        league="vss",
        field_type=field_type,
        n_blue=n_blue,
        n_yellow=n_yellow,
        dt=time_step_ms / 1000.0,
    )
    return states, commands, meta


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/golden/rsim_vss.npz")
    p.add_argument("--episodes", type=int, default=8)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--field-type", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    try:
        import robosim  # noqa: F401
    except ImportError:
        raise SystemExit(
            "robosim (rc-robosim) is not installed in this environment; "
            "install the reference's simulator wheel to record golden "
            "trajectories (reference setup.py:15)."
        )

    states, commands, meta = record_vss(
        n_episodes=args.episodes,
        n_steps=args.steps,
        field_type=args.field_type,
        seed=args.seed,
    )
    np.savez_compressed(args.out, states=states, commands=commands, **meta)
    print(f"wrote {args.out}: states {states.shape}, commands {commands.shape}")


if __name__ == "__main__":
    main()
