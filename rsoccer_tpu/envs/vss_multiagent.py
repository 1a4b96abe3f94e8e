"""VSSMultiAgent-v0 — all blue robots policy-controlled (extension).

The reference's VSS-v0 drives a single robot and moves its teammates with
OU noise (vss_gym.py:127-140); training full 3v3 teams requires controlling
every blue robot.  This additive env keeps VSS-v0's physics, observation
layout, rewards and resets, but takes a ``(n_blue * 2,)`` action vector
(wheel fractions per blue robot, same per-wheel conversion) while yellows
stay OU-driven.  Rewards remain the reference's team-level shaping computed
for robot 0 — suitable for centralized training / parameter sharing.

Not part of the reference surface; registered as ``VSSMultiAgent-v0``.
"""

from __future__ import annotations

import jax.numpy as jnp

from rsoccer_tpu.core.state import VSSCommands
from rsoccer_tpu.envs import ou
from rsoccer_tpu.envs.vss import VSSEnv


class VSSMultiAgentEnv(VSSEnv):
    """3v3 with every blue robot under policy control."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.action_size = 2 * self.n_blue

    def pre_physics(self, state, action, noise):
        ou_x = ou.ou_update(state.ou_x, noise["ou"], self.time_step)
        blue_actions = action.reshape(self.n_blue, 2)
        all_actions = jnp.concatenate([blue_actions, ou_x[self.n_blue :]])
        wl, wr = self._actions_to_wheels(all_actions)
        commands = VSSCommands(v_wheel0=wl, v_wheel1=wr)
        return commands, (ou_x, wl, wr)
