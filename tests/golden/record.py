"""Record golden trajectories for regression testing.

Run after an *intentional* physics/task change to refresh fixtures:

    env -u PYTHONPATH JAX_PLATFORMS=cpu python tests/golden/record.py

Each fixture rolls a fixed policy from a fixed seed and stores coarse
checkpoints of observations and rewards.  `test_golden.py` replays them and
asserts agreement — catching unintended behavior drift from refactors or
kernel rewrites (the role the reference-vs-rSim golden tests in SURVEY §4
would play if `robosim` were installable here).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

import rsoccer_tpu

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures.npz")
N_STEPS = 60


def scripted_action(env_id, t, action_size):
    """Deterministic, env-agnostic action script."""
    base = np.sin(0.1 * t + np.arange(action_size))
    return jnp.asarray(base, jnp.float32)


def record():
    data = {}
    for env_id in rsoccer_tpu.registered_ids():
        env = rsoccer_tpu.make(env_id)
        state, obs = env.reset(jax.random.PRNGKey(123))
        obss, rews, dones = [np.asarray(obs)], [], []
        for t in range(N_STEPS):
            a = scripted_action(env_id, t, env.action_size)
            state, obs, r, term, trunc, info = env.step(
                state, a, jax.random.PRNGKey(1000 + t)
            )
            obss.append(np.asarray(obs))
            rews.append(float(r))
            dones.append(bool(term) or bool(trunc))
        key = env_id.replace("-", "_")
        data[f"{key}_obs"] = np.stack(obss)
        data[f"{key}_rew"] = np.asarray(rews, np.float32)
        data[f"{key}_done"] = np.asarray(dones)
        print(f"{env_id}: recorded {N_STEPS} steps, "
              f"sum|obs|={np.abs(np.stack(obss)).sum():.3f}")
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    record()
