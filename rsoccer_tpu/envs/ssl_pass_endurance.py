"""SSLPassEndurance-v0: shooter passes to a frozen receiver.

Behavioral spec from the reference (ssl/ssl_hw_challenge/pass_endurance.py):

  - Obs Box(16): ball 4 + 2 blues x [x, y, sin, cos, norm_w(v_theta),
    infrared in {0,1}] (:55, :77-91).  The READMEs claim Box(18); the code's
    4 + 6*2 = 16 wins (SURVEY §2 quirk #4).
  - Action Box(3): shooter vtheta, kick (|a| > 0.5 deadzone), dribbler
    (:53, :106-119).  Shooter cannot translate (v=0); receiver is frozen
    with dribbler always on (:121-124).
  - Reward: +1 and done when the receiver's infrared fires; otherwise
    ball_grad toward the receiver scaled by 1/ball_grad_scale; -1 and done
    on a "wrong ball" — ball leaves the shooter-receiver bounding box
    (integer-centimeter compare) or stays at constant receiver-distance for
    > 20 steps (:128-156, :187-214).  The reference's ``holding_steps > 15``
    condition is dead code — the counter is never incremented — and is
    matched by omission.
  - ``reversed_dist`` is *written* (not accumulated) into the shaping dict
    on the done step (:146-155).
  - Reset (:158-185): ball uniform +-1.5 square; shooter 0.115 m beyond the
    ball on the |y| side facing it (theta 270/90 deg); receiver mirrored in
    y with |recv_x - ball_x| >= 1, aimed at the shooter.
  - 1200-step TimeLimit (rsoccer_gym/__init__.py:26-30).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rsoccer_tpu.core.state import WorldState, zero_ssl_commands
from rsoccer_tpu.envs import spawn
from rsoccer_tpu.envs.ssl_common import SSLTaskBase

_SHAPING_KEYS = ("reversed_dist", "ball_grad")
N_CAND = 16


class PEState(NamedTuple):
    world: WorldState
    steps: jnp.ndarray
    stopped_steps: jnp.ndarray  # int32
    shaping: jnp.ndarray  # (2,) [reversed_dist (written), ball_grad (accum)]


class SSLPassEnduranceEnv(SSLTaskBase):
    obs_size = 16
    action_size = 3
    max_episode_steps = 1200  # rsoccer_gym/__init__.py:29
    max_kick_x = 5.0

    def __init__(
        self,
        field_type: int = 2,
        time_step: float = 0.025,
        curriculum: bool = False,
        catch_scale: float = 1.0,
        aim_shaping: float = 0.0,
    ):
        super().__init__(field_type, n_blue=2, n_yellow=0, time_step=time_step)
        self.obs_size = 4 + 6 * self.n_blue
        # Training-time extension (NOT reference behavior): widen the
        # receiver's effective catch window by this factor for the
        # pass-received test ONLY (obs keep the physical infrared).  The
        # reference pass lands only when the ball meets the receiver's
        # kicker face — an aim window of ~+-0.01 rad at range, too small
        # for RL exploration to hit (docs/training.md: SAC plateaus at
        # 17.6%, PPO erodes the BC clone).  Stage training at
        # catch_scale 4 -> 2 -> 1 (the Dribbling playbook: each stage
        # --init from the last); evaluate on a default-constructed env.
        self.catch_scale = float(catch_scale)
        # Training-time extension (NOT reference behavior): spawn the
        # receiver at a uniform 0.25..2.5 m offset instead of the
        # reference's >= 1 m rejection (pass_endurance.py:162-176).  A pass
        # lands only if the ball meets the receiver's kicker face —
        # tolerance ~0.04 m, i.e. an angular window shrinking as 1/dist —
        # so short passes give the aim/timing skill a learnable gradient
        # that the >= 1 m task alone does not.  Evaluate on a
        # default-constructed env (reference-exact resets).
        self.curriculum = curriculum
        # Training-time extension (NOT reference behavior): when the ball
        # is in flight (speed > 1 m/s), add
        # ``-aim_shaping * angle(ball_v, ball->receiver)`` — a dense
        # gradient on the aim error itself, the quantity whose ~±0.01 rad
        # tolerance makes the sparse pass reward unlearnable from scratch
        # (docs/training.md).  0 disables (default, reference-exact).
        self.aim_shaping = float(aim_shaping)
        f = self.field
        self.ball_grad_scale = float(
            np.linalg.norm([f.width / 2, f.length / 2]) / 4
        )

    # ------------------------------------------------------------------ obs
    def _observe(self, world: WorldState) -> jnp.ndarray:
        b = world.ball
        rb = world.robots
        blue = jnp.stack(
            [
                self._norm_pos(rb.x),
                self._norm_pos(rb.y),
                jnp.sin(rb.theta),
                jnp.cos(rb.theta),
                self._norm_w(rb.v_theta),
                jnp.where(rb.infrared, 1.0, 0.0),
            ],
            axis=-1,
        )  # (2, 6)
        head = jnp.stack(
            [
                self._norm_pos(b.x),
                self._norm_pos(b.y),
                self._norm_v(b.v_x),
                self._norm_v(b.v_y),
            ]
        )
        return jnp.concatenate([head, blue.reshape(-1)]).astype(jnp.float32)

    def observe(self, state) -> jnp.ndarray:
        return self._observe(state.world)

    # ---------------------------------------------------------------- noise
    def reset_noise_spec(self):
        return {
            "ball": ((2,), "uniform"),
            "recv_x": ((N_CAND,), "uniform"),
        }

    # ---------------------------------------------------------------- reset
    def reset_state(self, noise):
        bxy = -1.5 + noise["ball"] * 3.0
        ball_x, ball_y = bxy[0], bxy[1]
        factor = jnp.where(ball_y >= 0, 1.0, -1.0)
        offset = 0.115 * factor
        shooter_x = ball_x
        shooter_y = ball_y + offset
        # 270 deg (facing -y) when above, 90 deg (facing +y) when below
        shooter_theta = jnp.where(factor > 0, -jnp.pi / 2, jnp.pi / 2)

        # receiver x: uniform +-1.5 rejected to |recv_x - ball_x| >= 1
        cand = -1.5 + noise["recv_x"] * 3.0
        ok = jnp.abs(cand - ball_x) >= 1.0
        (recv_x,) = spawn.pick_first(ok, cand)
        if self.curriculum:
            # distance curriculum: offset 0.25..2.5 m, either side, folded
            # back into the +-1.5 reset region
            dist = 0.25 + noise["recv_x"][0] * 2.25
            side = jnp.where(noise["recv_x"][1] < 0.5, -1.0, 1.0)
            recv_x = jnp.clip(ball_x + side * dist, -1.5, 1.5)
            # if clipping collapsed the offset (ball near the edge), flip
            # to the roomier side
            recv_x = jnp.where(
                jnp.abs(recv_x - ball_x) < 0.25,
                jnp.clip(ball_x - side * dist, -1.5, 1.5),
                recv_x,
            )
        recv_y = -ball_y
        vx = recv_x - shooter_x
        vy = recv_y - shooter_y
        recv_theta = jnp.arctan2(vy, vx) + jnp.pi  # aimed back at shooter

        world = self.make_world(
            ball_x, ball_y,
            rx=jnp.stack([shooter_x, recv_x]),
            ry=jnp.stack([shooter_y, recv_y]),
            rtheta=jnp.stack([shooter_theta, recv_theta]),
        )
        state = PEState(
            world=world,
            steps=jnp.zeros((), jnp.int32),
            stopped_steps=jnp.zeros((), jnp.int32),
            shaping=jnp.zeros((2,)),
        )
        return state

    def _widened_catch(self, world: WorldState):
        """Pass-received test with the receiver's kicker face widened by
        ``catch_scale`` (same geometry as physics/ssl._face_zone, wider
        lateral window + a little extra depth so a fast ball can't step
        across it)."""
        f, cfg = self.field, self.physics_cfg
        dx = world.ball.x - world.robots.x[1]
        dy = world.ball.y - world.robots.y[1]
        c = jnp.cos(world.robots.theta[1])
        s = jnp.sin(world.robots.theta[1])
        lx = dx * c + dy * s
        ly = -dx * s + dy * c
        lo = f.rbt_distance_center_kicker - f.rbt_kicker_thickness - f.ball_radius
        hi = (
            f.rbt_distance_center_kicker
            + f.ball_radius
            + cfg.kicker_depth_slack
            + (self.catch_scale - 1.0) * 0.02
        )
        low = (world.ball.z - f.ball_radius) <= cfg.kicker_height
        return (
            (lx >= lo)
            & (lx <= hi)
            & (jnp.abs(ly) <= f.rbt_kicker_width / 2 * self.catch_scale)
            & low
        )

    # ----------------------------------------------------------------- step
    def transition(self, state: PEState, action, noise):
        # kick deadzone |a1| > 0.5 (reference :108)
        kick = jnp.where(jnp.abs(action[1]) > 0.5, action[1], 0.0)
        cmd = zero_ssl_commands(self.n_robots)
        cmd = cmd._replace(
            v_theta=cmd.v_theta.at[0].set(action[0] * self.max_w_cmd),
            kick_v_x=cmd.kick_v_x.at[0].set(kick * self.max_kick_x),
            dribbler=cmd.dribbler.at[0].set(action[2] > 0).at[1].set(True),
        )
        world = self._physics(state.world, cmd)

        bx, by = world.ball.x, world.ball.y
        sx, sy = world.robots.x[0], world.robots.y[0]
        rx, ry = world.robots.x[1], world.robots.y[1]
        if self.catch_scale != 1.0:
            received = self._widened_catch(world)
        else:
            received = world.robots.infrared[1]

        # ball_grad toward the receiver (reference :216-233)
        last_d = self.dist(state.world.ball.x, state.world.ball.y, rx, ry)
        d = self.dist(bx, by, rx, ry)
        ball_grad = jnp.clip(last_d - d, -1.0, 1.0) / self.ball_grad_scale

        # wrong-ball: integer-centimeter bounding-box test + stopped counter
        # (reference :187-214; int() truncates toward zero)
        cb = jnp.trunc(jnp.stack([bx, by]) * 100).astype(jnp.int32)
        cs = jnp.trunc(jnp.stack([sx, sy]) * 100).astype(jnp.int32)
        cr = jnp.trunc(jnp.stack([rx, ry]) * 100).astype(jnp.int32)
        inside = jnp.all(
            (jnp.minimum(cr, cs) <= cb) & (cb <= jnp.maximum(cr, cs))
        )
        lb = state.world.ball
        last_dist_recv = self.dist(lb.x, lb.y, rx, ry)
        stopped = jnp.abs(last_dist_recv - d) < 0.01
        stopped_steps = jnp.where(stopped, state.stopped_steps + 1, 0)
        wrong = (stopped_steps > 20) | ~inside

        reward = (
            jnp.where(received, 1.0, ball_grad) + jnp.where(wrong, -1.0, 0.0)
        )
        if self.aim_shaping:
            bvx, bvy = world.ball.v_x, world.ball.v_y
            speed = jnp.sqrt(bvx * bvx + bvy * bvy)
            tx, ty = rx - bx, ry - by
            cosang = (bvx * tx + bvy * ty) / (
                speed * jnp.sqrt(tx * tx + ty * ty) + 1e-6
            )
            aim_err = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
            reward = reward - self.aim_shaping * aim_err * (speed > 1.0)
        done = received | wrong

        # reversed_dist written at done (reference :146-155)
        dist_robs = self.dist(rx, ry, sx, sy)
        dist_ball = d
        reversed_dist = (dist_robs - dist_ball) / jnp.maximum(dist_robs, 1e-8)
        ball_grad_acc = state.shaping[1] + jnp.where(received, 0.0, ball_grad)
        shaping = jnp.stack(
            [
                jnp.where(done, reversed_dist, state.shaping[0]),
                ball_grad_acc,
            ]
        )

        ns = PEState(
            world=world,
            steps=state.steps + 1,
            stopped_steps=stopped_steps,
            shaping=shaping,
        )
        info = {k: shaping[i] for i, k in enumerate(_SHAPING_KEYS)}
        return ns, reward, done, info
