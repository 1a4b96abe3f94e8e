"""VSSSelfPlay-v0 — both teams policy-controlled, with mirrored views.

The reference's VSS-v0 drives one robot and fills both rosters with OU
noise (vss_gym.py:127-140); competitive 3v3 training needs the yellow team
under a (frozen) policy too.  This additive env takes a
``(2 * n_robots,)`` action vector — wheel fractions for every robot, blues
first — and provides the OPPONENT'S VIEW: the world rotated 180 degrees
with teams swapped, so a policy trained as "blue attacking +x" can drive
the yellow team unchanged (wheel commands are body-frame, hence
frame-independent).

Physics, observation layout, rewards (blue-centric), resets and the
1200-step limit are exactly VSS-v0's.  Not part of the reference surface;
registered as ``VSSSelfPlay-v0``.
"""

from __future__ import annotations

import jax.numpy as jnp

from rsoccer_tpu.core.state import BallState, RobotsState, VSSCommands, WorldState
from rsoccer_tpu.envs.vss import VSSEnv
from rsoccer_tpu.physics import common


class VSSSelfPlayEnv(VSSEnv):
    """3v3 with every robot under policy control (blue rows then yellow)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.n_blue != self.n_yellow:
            raise ValueError(
                "self-play mirroring needs equal team sizes, got "
                f"{self.n_blue}v{self.n_yellow}"
            )
        self.action_size = 2 * self.n_robots

    def transition_noise_spec(self):
        return {}  # no OU — both teams are policy-driven

    def pre_physics(self, state, action, noise):
        acts = action.reshape(self.n_robots, 2)
        wl, wr = self._actions_to_wheels(acts)
        commands = VSSCommands(v_wheel0=wl, v_wheel1=wr)
        return commands, (state.ou_x, wl, wr)  # ou_x carried unchanged

    # ------------------------------------------------------------- mirror
    def mirror_world(self, world: WorldState) -> WorldState:
        """180-degree field rotation with teams swapped: the world as the
        yellow team sees it if it called itself blue.  Rotation by pi about
        the center: (x, y) -> (-x, -y), theta -> theta + pi, planar
        velocities negate, angular velocity and the vertical axis are
        invariant."""
        nb = self.n_blue
        rb = world.robots

        def swap(a):
            return jnp.concatenate([a[nb:], a[:nb]], axis=0)

        return WorldState(
            ball=BallState(
                x=-world.ball.x, y=-world.ball.y, z=world.ball.z,
                v_x=-world.ball.v_x, v_y=-world.ball.v_y, v_z=world.ball.v_z,
            ),
            robots=RobotsState(
                x=swap(-rb.x),
                y=swap(-rb.y),
                theta=common.wrap_angle(swap(rb.theta) + jnp.pi),
                v_x=swap(-rb.v_x),
                v_y=swap(-rb.v_y),
                v_theta=swap(rb.v_theta),
                infrared=swap(rb.infrared),
                v_wheel=swap(rb.v_wheel),
            ),
        )

    def observe_opponent(self, state) -> jnp.ndarray:
        """The 40-dim VSS observation from the yellow team's perspective."""
        return self._observe(self.mirror_world(state.world))
