"""Shared machinery for the SSL hardware-challenge tasks.

Mirrors what the reference factors into ``SSLBaseEnv`` (ssl/ssl_gym_base.py)
plus the helpers duplicated across the four task files: normalisation
constants, the global->local action conversion with its scale-only-above-max
clip idiom, and the distance-based shaping rewards.

Unit note: the reference's frames carry v_theta in deg/s (Frame.py:8) and its
tasks normalise by ``max_w = 10`` deg/s (e.g. static_defenders.py:77) while
*commanding* ``action * 10`` in rad/s — we keep radians internally, so the
obs normaliser divides by deg2rad(10) to reproduce the reference's observed
values exactly (matching code behavior, not the docstrings — SURVEY §2).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from rsoccer_tpu.core.field import ssl_field
from rsoccer_tpu.core.state import (
    BallState,
    RobotsState,
    SSLCommands,
    WorldState,
    zero_ssl_commands,
)
from rsoccer_tpu.envs.base import Env
from rsoccer_tpu.physics.config import SSL_PHYSICS
from rsoccer_tpu.physics.ssl import make_ssl_step

_EPS = 1e-8


class SSLTaskBase(Env):
    """Common constants + helpers for the SSL tasks (field_type 2)."""

    league = "ssl"

    # task speed caps overriding the base-class derived values
    # (reference static_defenders.py:76-78 etc.)
    max_v = 2.5  # m/s
    max_w_cmd = 10.0  # rad/s command scale
    max_w_norm = math.radians(10.0)  # obs normaliser (ref divides deg/s by 10)
    kick_speed_x = 5.0
    norm_bounds = 1.2

    def __init__(self, field_type: int, n_blue: int, n_yellow: int, time_step: float):
        self.field = ssl_field(field_type)
        self.n_blue = n_blue
        self.n_yellow = n_yellow
        self.n_robots = n_blue + n_yellow
        self.time_step = time_step
        self.max_pos = self.field.max_pos
        self.physics_cfg = SSL_PHYSICS
        self._physics = make_ssl_step(self.field, SSL_PHYSICS, time_step)

    # --- normalisation (reference ssl_gym_base.py:213-220 with task caps)
    def _norm_pos(self, v):
        return jnp.clip(v / self.max_pos, -self.norm_bounds, self.norm_bounds)

    def _norm_v(self, v):
        return jnp.clip(v / self.max_v, -self.norm_bounds, self.norm_bounds)

    def _norm_w(self, w):
        return jnp.clip(w / self.max_w_norm, -self.norm_bounds, self.norm_bounds)

    # --- actions -----------------------------------------------------------
    def convert_actions(self, action, angle):
        """Denormalise, rotate global->local, clip speed norm — reference
        convert_actions (static_defenders.py:132-148), including the
        ``v_norm < max_v or max_v/v_norm`` scale-only-above-max idiom."""
        v_x = action[0] * self.max_v
        v_y = action[1] * self.max_v
        v_theta = action[2] * self.max_w_cmd
        c, s = jnp.cos(angle), jnp.sin(angle)
        v_x, v_y = v_x * c + v_y * s, -v_x * s + v_y * c
        v_norm = jnp.sqrt(v_x * v_x + v_y * v_y)
        scale = jnp.where(
            v_norm < self.max_v, 1.0, self.max_v / jnp.maximum(v_norm, _EPS)
        )
        return v_x * scale, v_y * scale, v_theta

    def single_robot_commands(
        self, v_x, v_y, v_theta, kick_v_x=0.0, dribbler=False
    ) -> SSLCommands:
        """Commands pytree driving blue robot 0; all others idle."""
        cmd = zero_ssl_commands(self.n_robots)
        return cmd._replace(
            v_x=cmd.v_x.at[0].set(v_x),
            v_y=cmd.v_y.at[0].set(v_y),
            v_theta=cmd.v_theta.at[0].set(v_theta),
            kick_v_x=cmd.kick_v_x.at[0].set(kick_v_x),
            dribbler=cmd.dribbler.at[0].set(dribbler),
        )

    # --- shared obs block --------------------------------------------------
    def observe_standard(self, world: WorldState, infrared_low: float = 0.0):
        """Ball block + per-blue 8-tuple + per-yellow (x, y) — the layout
        shared by StaticDefenders/Dribbling/ContestedPossession
        (static_defenders.py:90-112).  ``infrared_low`` is the value emitted
        when infrared is off: 0 for most tasks, -1 for Dribbling
        (dribbling.py:98)."""
        b = world.ball
        rb = world.robots
        nb = self.n_blue
        blue = jnp.stack(
            [
                self._norm_pos(rb.x[:nb]),
                self._norm_pos(rb.y[:nb]),
                jnp.sin(rb.theta[:nb]),
                jnp.cos(rb.theta[:nb]),
                self._norm_v(rb.v_x[:nb]),
                self._norm_v(rb.v_y[:nb]),
                self._norm_w(rb.v_theta[:nb]),
                jnp.where(rb.infrared[:nb], 1.0, infrared_low),
            ],
            axis=-1,
        )  # (nb, 8)
        yellow = jnp.stack(
            [self._norm_pos(rb.x[nb:]), self._norm_pos(rb.y[nb:])], axis=-1
        )  # (ny, 2)
        head = jnp.stack(
            [
                self._norm_pos(b.x),
                self._norm_pos(b.y),
                self._norm_v(b.v_x),
                self._norm_v(b.v_y),
            ]
        )
        return jnp.concatenate(
            [head, blue.reshape(-1), yellow.reshape(-1)]
        ).astype(jnp.float32)

    # --- shared reward helpers --------------------------------------------
    @staticmethod
    def dist(ax, ay, bx, by):
        return jnp.sqrt((ax - bx) ** 2 + (ay - by) ** 2)

    def ball_dist_rw(self, world, last_world):
        """Robot-0-to-ball distance delta, clipped (static_defenders.py:256-282)."""
        last_d = self.dist(
            last_world.robots.x[0], last_world.robots.y[0],
            last_world.ball.x, last_world.ball.y,
        )
        d = self.dist(
            world.robots.x[0], world.robots.y[0], world.ball.x, world.ball.y
        )
        return jnp.clip(last_d - d, -1.0, 1.0)

    def ball_grad_rw(self, world, last_world):
        """Ball-to-goal distance delta, clipped (static_defenders.py:284-309)."""
        gx = self.field.half_length
        last_d = self.dist(last_world.ball.x, last_world.ball.y, gx, 0.0)
        d = self.dist(world.ball.x, world.ball.y, gx, 0.0)
        return jnp.clip(last_d - d, -1.0, 1.0)

    def energy_pen(self, world):
        """Sum |achieved wheel speed| of robot 0 (static_defenders.py:311-322
        reads the post-step frame's wheel speeds)."""
        return jnp.sum(jnp.abs(world.robots.v_wheel[0]))

    def make_world(self, ball_x, ball_y, rx, ry, rtheta) -> WorldState:
        zn = jnp.zeros((self.n_robots,))
        return WorldState(
            ball=BallState(
                x=jnp.asarray(ball_x), y=jnp.asarray(ball_y),
                z=jnp.asarray(self.field.ball_radius),
                v_x=jnp.zeros(()), v_y=jnp.zeros(()), v_z=jnp.zeros(()),
            ),
            robots=RobotsState(
                x=jnp.asarray(rx), y=jnp.asarray(ry), theta=jnp.asarray(rtheta),
                v_x=zn, v_y=zn, v_theta=zn,
                infrared=jnp.zeros((self.n_robots,), bool),
                v_wheel=jnp.zeros((self.n_robots, 4)),
            ),
        )
