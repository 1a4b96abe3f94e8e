"""SSLDribbling-v0: slalom a 4-gate course while keeping the ball.

Behavioral spec from the reference (ssl/ssl_hw_challenge/dribbling.py):

  - Obs Box(21): checkpoint progress scalar ((count/6)*2 - 1) + ball 4 +
    blue 8 (infrared reported in {-1, 1}!) + 4 yellows x 2 (:76-104).
  - Action Box(4): global vx, vy, vtheta, dribbler — no kicker (:49, :106-115).
  - Reward +1 per checkpoint crossing; the gate automaton over ball-y sign
    changes within x-windows between the nodes at x = -0.5, -1, -1.5, -2;
    7 crossings complete the course (:58-64, :156-181).
  - Termination: any yellow moving (|v| > 0.05 -> collision), robot leaving
    the margin-1 course box, reverse-crossing the last gate, or count == 7
    (:142-183).  4800-step TimeLimit (rsoccer_gym/__init__.py:14-18).
  - Reset is deterministic (:187-202).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rsoccer_tpu.core.state import WorldState
from rsoccer_tpu.envs.ssl_common import SSLTaskBase

NODES = (-0.5, -1.0, -1.5, -2.0)  # reference :60-63
MARGIN = 1.0  # reference :64


class DribblingState(NamedTuple):
    world: WorldState
    steps: jnp.ndarray
    checkpoints: jnp.ndarray  # int32 count, 0..7


class SSLDribblingEnv(SSLTaskBase):
    obs_size = 21
    action_size = 4
    max_episode_steps = 4800  # rsoccer_gym/__init__.py:17

    def __init__(
        self,
        field_type: int = 2,
        time_step: float = 0.025,
        curriculum: bool = False,
    ):
        super().__init__(field_type, n_blue=1, n_yellow=4, time_step=time_step)
        self.obs_size = 5 + 8 * self.n_blue + 2 * self.n_yellow
        # Training-time extension (NOT part of the reference spec): when
        # True, resets spawn uniformly over course stages 0..6 with the
        # matching checkpoint count, so the sparse +1-per-gate signal
        # (measured ~2.7 crossings per 1M random-policy steps from the
        # deterministic start) reaches every stage of the course from the
        # first update.  Evaluate on a default-constructed env — its reset
        # is the reference's deterministic placement (dribbling.py:187-202).
        self.curriculum = curriculum

    def _observe(self, world: WorldState, checkpoints) -> jnp.ndarray:
        head = ((checkpoints.astype(jnp.float32) / 6.0) * 2.0) - 1.0  # :80
        rest = self.observe_standard(world, infrared_low=-1.0)  # :98
        return jnp.concatenate([head[None], rest]).astype(jnp.float32)

    def observe(self, state) -> jnp.ndarray:
        return self._observe(state.world, state.checkpoints)

    # ---------------------------------------------------------------- reset
    def reset_noise_spec(self):
        if not self.curriculum:
            return {}
        return {"stage": ((1,), "uniform"), "place": ((3,), "uniform")}

    def reset_state(self, noise):
        if not self.curriculum:
            # deterministic placement (reference :187-202)
            ball_x, ball_y = jnp.asarray(-0.1), jnp.asarray(0.0)
            blue_x, blue_y = jnp.asarray(0.0), jnp.asarray(0.0)
            stage = jnp.zeros((), jnp.int32)
        else:
            stage = jnp.floor(noise["stage"][0] * 7.0).astype(jnp.int32)
            stage = jnp.clip(stage, 0, 6)
            # Per-stage ball boxes sit just up-course of the NEXT gate the
            # automaton expects (transition() windows): stage 1 -> up-cross
            # in (NODES[1], NODES[0]-ish), even>=2 -> down-cross in
            # (NODES[3], NODES[2]), odd>=2 -> up-cross in (NODES[3]-1,
            # NODES[3]).  |y| >= 0.2 keeps spawns clear of the on-axis
            # yellows (sum of radii 0.18) so a reset can never detonate the
            # collision termination by overlap.
            x_lo = jnp.asarray([-0.10, -1.45, -1.95, -2.60, -1.95, -2.60, -1.95])
            x_hi = jnp.asarray([-0.10, -1.05, -1.60, -2.05, -1.60, -2.05, -1.60])
            y_lo = jnp.asarray([0.0, -0.30, 0.20, -0.30, 0.20, -0.30, 0.20])
            y_hi = jnp.asarray([0.0, -0.20, 0.30, -0.20, 0.30, -0.20, 0.30])
            # one-hot select, not table[stage]: a traced index lowers to a
            # per-lane gather kernel under vmap (see envs/spawn.pick_first)
            onehot = jnp.arange(7) == stage
            sel = lambda t: jnp.sum(jnp.where(onehot, t, 0.0))  # noqa: E731
            u = noise["place"]
            ball_x = sel(x_lo) + (sel(x_hi) - sel(x_lo)) * u[0]
            ball_y = sel(y_lo) + (sel(y_hi) - sel(y_lo)) * u[1]
            # robot behind the ball w.r.t. course direction (-x), reference
            # heading 180 deg; at stage 0 exactly the reference placement
            blue_x = jnp.where(stage == 0, 0.0, ball_x + 0.13)
            blue_y = jnp.where(stage == 0, 0.0, ball_y)
        world = self.make_world(
            ball_x=ball_x, ball_y=ball_y,
            rx=jnp.concatenate(
                [blue_x[None], jnp.asarray([NODES[0], NODES[1], NODES[2], NODES[3]])]
            ),
            ry=jnp.concatenate([blue_y[None], jnp.zeros((4,))]),
            rtheta=jnp.full((5,), jnp.pi),  # 180 degrees
        )
        state = DribblingState(
            world=world,
            steps=jnp.zeros((), jnp.int32),
            checkpoints=stage,
        )
        return state

    # ----------------------------------------------------------------- step
    def transition(self, state: DribblingState, action, noise):
        angle = state.world.robots.theta[0]
        v_x, v_y, v_theta = self.convert_actions(action, angle)
        commands = self.single_robot_commands(
            v_x, v_y, v_theta, dribbler=action[3] > 0
        )
        world = self._physics(state.world, commands)

        rb = world.robots
        bx, by = world.ball.x, world.ball.y
        last_by = state.world.ball.y
        count = state.checkpoints

        # collision: any yellow robot moving (reference :143-145)
        collision = jnp.any(
            (jnp.abs(rb.v_x[1:]) > 0.05) | (jnp.abs(rb.v_y[1:]) > 0.05)
        )

        # course box (reference :147-152)
        rx, ry = rb.x[0], rb.y[0]
        rbt_out = (
            (rx < NODES[3] - MARGIN) | (rx > MARGIN) | (jnp.abs(ry) > MARGIN)
        )

        down = (last_by >= 0) & (by < 0)  # y crossed downward
        up = (last_by < 0) & (by >= 0)  # y crossed upward

        # gate automaton (reference :156-181); active only when the robot is
        # in bounds (the reference's elif chain)
        in01 = (bx < NODES[0]) & (bx > NODES[1])
        in12 = (bx < NODES[1]) & (bx > NODES[2])
        in23 = (bx < NODES[2]) & (bx > NODES[3])
        in3m = (bx > NODES[3] - MARGIN) & (bx < NODES[3])

        even_ge2 = (count >= 2) & (count % 2 == 0)
        odd_ge2 = (count >= 2) & (count % 2 == 1)

        cross0 = (count == 0) & in01 & down
        cross1 = (count == 1) & in12 & up
        cross_even = even_ge2 & in23 & down
        reverse_even = even_ge2 & in23 & up
        cross_odd = odd_ge2 & in3m & up

        crossed = ~rbt_out & (cross0 | cross1 | cross_even | cross_odd)
        reversed_gate = ~rbt_out & reverse_even

        new_count = count + jnp.where(crossed, 1, 0)
        completed = ~rbt_out & cross_even & (new_count == 7)

        reward = jnp.where(crossed, 1.0, 0.0)
        if self.curriculum:
            # Training-time potential shaping toward the NEXT gate the
            # automaton expects.  The target is TWO-PHASE: while the ball is
            # outside the gate's x-window it sits on the APPROACH side of
            # the axis (a crossing only counts inside the window —
            # dribbling.py:158-180 — so dipping early must not be
            # rewarded); once inside, it flips to the exit side.  Target is
            # computed from the step's incoming state, so a crossing is
            # never penalised by the target switching.  Magnitude <=
            # 0.5*v_max*dt = 0.03/step against the +1 gate reward.
            # Curriculum-only; the default env's reward is the reference's
            # exact +1-per-gate.
            obx, oby = state.world.ball.x, state.world.ball.y
            onehot = jnp.arange(8) == count
            sel8 = lambda t: jnp.sum(jnp.where(onehot, jnp.asarray(t), 0.0))  # noqa: E731
            # gate window centers and down/up direction per count
            gx = sel8([-0.75, -1.25, -1.75, -2.50, -1.75, -2.50, -1.75, -1.75])
            w_lo = sel8([NODES[1], NODES[2], NODES[3], NODES[3] - MARGIN,
                         NODES[3], NODES[3] - MARGIN, NODES[3], NODES[3]])
            w_hi = sel8([NODES[0], NODES[1], NODES[2], NODES[3],
                         NODES[2], NODES[3], NODES[2], NODES[2]])
            downward = (count == 0) | ((count >= 2) & (count % 2 == 0))
            # inset the flip region: the raw window edges ARE the node
            # positions, so flipping at the edge steers the dip right over
            # a yellow (measured grazing collision at 0.178 m); flipping
            # 0.15 m inside starts the dip mid-window with full clearance
            in_w = (obx > w_lo + 0.15) & (obx < w_hi - 0.15)
            # approach above the axis for a down-crossing (dip only inside
            # the window), mirrored for up-crossings.  Approach offset 0.35
            # keeps the CARRYING ROBOT clear of the on-axis yellows: the
            # robot trails the ball by the 0.115 face distance, and
            # robot-robot contact needs 0.18 — a 0.25 ball offset was
            # measured to put the robot at ~0.14 when rounding a node
            # (grazing collision).  Exit offset 0.15 is reached mid-window,
            # >= 0.25 m from the nodes.
            gy = jnp.where(
                downward,
                jnp.where(in_w, -0.15, 0.35),
                jnp.where(in_w, 0.15, -0.35),
            )
            d_new = jnp.hypot(bx - gx, by - gy)
            d_old = jnp.hypot(obx - gx, oby - gy)
            reward = reward + 0.5 * (d_old - d_new)
        done = collision | rbt_out | reversed_gate | completed

        ns = DribblingState(
            world=world, steps=state.steps + 1, checkpoints=new_count
        )
        # base-class info is empty for this task (no reward_shaping_total in
        # the reference — SSLHWDribblingEnv does not override step)
        info = {}
        return ns, reward, done, info
