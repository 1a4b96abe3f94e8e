"""SSLContestedPossession-v0: steal the ball from a holding enemy and score.

Behavioral spec from the reference (ssl/ssl_hw_challenge/
contested_possession.py):

  - Obs Box(14): ball 4 + blue 8 + yellow 2 (:78-105).
  - Action Box(5): as StaticDefenders (:107-134).
  - Reward: goal +5; shaped ball_dist + ball_grad + energy otherwise; a
    moving yellow (|v| > 0.1) is a collision ending the episode — and the
    shaping branch still pays out on that same step (:136-208: the collision
    loop sets done before an *independent* if/elif chain).
  - Reset (:210-227): blue at origin; enemy uniform in the penalty strip
    (x in [pen_len, half_len - pen_len], |y| <= half_pen_wid) facing away
    (theta=180); ball 0.1 m in front of the enemy.
  - 1200-step TimeLimit (rsoccer_gym/__init__.py:20-24).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rsoccer_tpu.core.state import WorldState
from rsoccer_tpu.envs.ssl_common import SSLTaskBase

_SHAPING_KEYS = (
    "goal",
    "rbt_in_gk_area",
    "done_ball_out",
    "done_ball_out_right",
    "done_rbt_out",
    "ball_dist",
    "ball_grad",
    "energy",
    "collision",
)


class CPState(NamedTuple):
    world: WorldState
    steps: jnp.ndarray
    shaping: jnp.ndarray  # (9,) accumulators, order _SHAPING_KEYS


class SSLContestedPossessionEnv(SSLTaskBase):
    obs_size = 14
    action_size = 5
    max_episode_steps = 1200  # rsoccer_gym/__init__.py:23

    def __init__(self, field_type: int = 2, time_step: float = 0.025):
        super().__init__(field_type, n_blue=1, n_yellow=1, time_step=time_step)
        self.obs_size = 4 + 8 * self.n_blue + 2 * self.n_yellow
        f = self.field
        # reward scales (reference :54-61)
        self.ball_dist_scale = float(np.linalg.norm([f.width, f.length / 2]))
        self.ball_grad_scale = float(
            np.linalg.norm([f.width / 2, f.length / 2]) / 4
        )
        self.energy_scale = 160.0 * 4 * 1200

    def observe(self, state) -> jnp.ndarray:
        return self.observe_standard(state.world)

    # ---------------------------------------------------------------- noise
    def reset_noise_spec(self):
        return {"enemy": ((2,), "uniform")}

    # ---------------------------------------------------------------- reset
    def reset_state(self, noise):
        f = self.field
        enemy_x = f.penalty_length + noise["enemy"][0] * (
            f.half_length - 2 * f.penalty_length
        )
        enemy_y = -f.penalty_width / 2 + noise["enemy"][1] * f.penalty_width
        world = self.make_world(
            ball_x=enemy_x - 0.1, ball_y=enemy_y,
            rx=jnp.stack([jnp.zeros(()), enemy_x]),
            ry=jnp.stack([jnp.zeros(()), enemy_y]),
            rtheta=jnp.asarray([0.0, jnp.pi]),
        )
        state = CPState(
            world=world,
            steps=jnp.zeros((), jnp.int32),
            shaping=jnp.zeros((len(_SHAPING_KEYS),)),
        )
        return state

    # ----------------------------------------------------------------- step
    def transition(self, state: CPState, action, noise):
        f = self.field
        angle = state.world.robots.theta[0]
        v_x, v_y, v_theta = self.convert_actions(action, angle)
        commands = self.single_robot_commands(
            v_x, v_y, v_theta,
            kick_v_x=jnp.where(action[3] > 0, self.kick_speed_x, 0.0),
            dribbler=action[4] > 0,
        )
        world = self._physics(state.world, commands)

        half_len, half_wid = f.half_length, f.half_width
        pen_len, half_pen_wid = f.penalty_length, f.penalty_width / 2
        half_goal_wid = f.goal_width / 2
        rx, ry = world.robots.x[0], world.robots.y[0]
        bx, by = world.ball.x, world.ball.y

        # collision check is independent of the chain (reference :165-169)
        collision = (jnp.abs(world.robots.v_x[1]) > 0.1) | (
            jnp.abs(world.robots.v_y[1]) > 0.1
        )

        c_rbt_out = (rx < -0.2) | (jnp.abs(ry) > half_wid)
        c_gk = ~c_rbt_out & (rx > half_len - pen_len) & (jnp.abs(ry) < half_pen_wid)
        c_ball_out = ~c_rbt_out & ~c_gk & ((bx < 0) | (jnp.abs(by) > half_wid))
        c_ball_right = ~c_rbt_out & ~c_gk & ~c_ball_out & (bx > half_len)
        goal = c_ball_right & (jnp.abs(by) < half_goal_wid)
        ball_out_right = c_ball_right & ~goal
        chain_done = c_rbt_out | c_gk | c_ball_out | c_ball_right
        shaping_branch = ~chain_done  # shaping still pays on collision steps
        done = collision | chain_done

        ball_dist = self.ball_dist_rw(world, state.world) / self.ball_dist_scale
        ball_grad = self.ball_grad_rw(world, state.world) / self.ball_grad_scale
        energy = -self.energy_pen(world) / self.energy_scale
        shaped = ball_dist + ball_grad + energy

        reward = jnp.where(goal, 5.0, jnp.where(shaping_branch, shaped, 0.0))

        zero = jnp.zeros(())
        one = jnp.ones(())
        sb = shaping_branch
        shaping = state.shaping + jnp.stack(
            [
                jnp.where(goal, one, zero),
                jnp.where(c_gk, one, zero),
                jnp.where(c_ball_out, one, zero),
                jnp.where(ball_out_right, one, zero),
                jnp.where(c_rbt_out, one, zero),
                jnp.where(sb, ball_dist, zero),
                jnp.where(sb, ball_grad, zero),
                jnp.where(sb, energy, zero),
                jnp.where(collision, one, zero),
            ]
        )

        ns = CPState(world=world, steps=state.steps + 1, shaping=shaping)
        info = {k: shaping[i] for i, k in enumerate(_SHAPING_KEYS)}
        return ns, reward, done, info
