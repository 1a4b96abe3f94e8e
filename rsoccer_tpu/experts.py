"""Scripted expert policies (state-based, branch-free, vmappable).

These are NOT part of the reference API.  They exist to (a) prove by
construction that a task is completable under this framework's physics —
a regression test that guards the carry/dribbler dynamics (a physics change
that silently breaks turn-while-carrying makes SSLDribbling unlearnable,
see STATUS round-2 notes) — and (b) provide demonstration actions for
behavior-cloning warm starts.

The dribbling expert slaloms the gate course the way the reference's
automaton scores it (crossings only count inside each gate's x-window,
reference dribbling.py:156-181): travel along an offset approach lane,
stop over the gate center, rotate to a course-perpendicular heading, then
dive straight through.  The turn happens (nearly) in place because a
moving turn swings the held ball with the face and was measured to strand
the trailing robot 0.177-0.180 m from an on-axis yellow (contact: 0.18).
"""

from __future__ import annotations

import jax.numpy as jnp

from rsoccer_tpu.envs.ssl_dribbling import MARGIN, NODES

_FACE = 0.115  # ball-hold distance: rbt_distance_center_kicker + ball radius


def _wrap(a):
    return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi


def dribbling_gate(count):
    """Gate geometry for the crossing the automaton expects at ``count``:
    (center x, window lo/hi, downward?) — tables match the curriculum
    shaping (envs/ssl_dribbling.py:185-208)."""
    onehot = jnp.arange(8) == count
    sel8 = lambda t: jnp.sum(jnp.where(onehot, jnp.asarray(t), 0.0))  # noqa: E731
    gx = sel8([-0.75, -1.25, -1.75, -2.50, -1.75, -2.50, -1.75, -1.75])
    w_lo = sel8([NODES[1], NODES[2], NODES[3], NODES[3] - MARGIN,
                 NODES[3], NODES[3] - MARGIN, NODES[3], NODES[3]])
    w_hi = sel8([NODES[0], NODES[1], NODES[2], NODES[3],
                 NODES[2], NODES[3], NODES[2], NODES[2]])
    downward = (count == 0) | ((count >= 2) & (count % 2 == 0))
    return gx, w_lo, w_hi, downward


def dribbling_expert(state, carry_speed=1.2, dip_speed=0.6, fetch_speed=1.5,
                     kp=3.0, kw=5.0, w_max=6.0, lane=0.35):
    """Scripted SSLDribbling policy: state -> action Box(4) in [-1, 1].

    Three carry modes, selected branch-free:
      climb  — move the ball onto the approach lane (|y| = ``lane``, on the
               side the crossing must come FROM) with x held;
      cruise — follow the lane toward the gate center, decelerating on
               approach;
      dive   — inside the gate window (tested on the ROBOT x, which unlike
               the ball does not swing during turns): rotate to the
               course-perpendicular heading nearly in place, then push
               straight through the gate at ``dip_speed`` with the ball's
               x servoed onto the gate center.
    """
    world = state.world
    rb = world.robots
    rx, ry, theta = rb.x[0], rb.y[0], rb.theta[0]
    bx, by = world.ball.x, world.ball.y
    gx, w_lo, w_hi, downward = dribbling_gate(state.checkpoints)

    sign = jnp.where(downward, 1.0, -1.0)  # approach side of the axis
    lane_y = sign * lane

    c, s = jnp.cos(theta), jnp.sin(theta)
    fx, fy = rx + _FACE * c, ry + _FACE * s
    has_ball = jnp.hypot(fx - bx, fy - by) < 0.05

    # -- dive mode: robot center inside the inset window, or committed
    #    (ball already descending past the lane) inside the full window
    in_zone = (rx > w_lo + 0.15) & (rx < w_hi - 0.15)
    committed = sign * by < lane - 0.12
    dive = has_ball & (in_zone | (committed & (rx > w_lo) & (rx < w_hi)))

    # perpendicular heading: -90 deg for a down-crossing, +90 for up
    dive_theta = -sign * (jnp.pi / 2)
    dive_err = _wrap(dive_theta - theta)
    # push only once roughly aligned; servo the ball's x onto the gate axis
    push = jnp.clip(jnp.cos(dive_err), 0.0, 1.0)
    dive_vx = jnp.clip(kp * (gx - bx), -0.4, 0.4)
    dive_vy = -sign * dip_speed * push

    # -- climb: face-point control pushes the ball onto the lane (x held);
    # -- cruise: ROBOT-CENTER control toward the gate center — face-point
    #    control converges with the face at gx and the center 0.115 m
    #    up-course, just outside the dive zone (measured deadlock)
    on_lane = jnp.abs(by - lane_y) < 0.08
    nav_x = jnp.where(has_ball, jnp.where(on_lane, gx, bx), bx)
    nav_y = jnp.where(has_ball, lane_y, by)
    px = jnp.where(has_ball & on_lane, rx, fx)
    py = jnp.where(has_ball & on_lane, ry, fy)
    vx = kp * (nav_x - px)
    vy = kp * (nav_y - py)
    # decelerate on gate approach so the robot can stop inside the window
    near = jnp.abs(rx - gx) < 0.45
    speed_cap = jnp.where(
        has_ball, jnp.where(near, dip_speed, carry_speed), fetch_speed
    )
    v_norm = jnp.hypot(vx, vy)
    scale = jnp.minimum(1.0, speed_cap / jnp.maximum(v_norm, 1e-8))
    vx, vy = vx * scale, vy * scale
    cruise_theta = jnp.arctan2(nav_y - ry, nav_x - rx)

    # -- select mode
    out_vx = jnp.where(dive, dive_vx, vx)
    out_vy = jnp.where(dive, dive_vy, vy)
    err = jnp.where(dive, dive_err, _wrap(cruise_theta - theta))
    w = jnp.clip(kw * err, -w_max, w_max)

    # env action units: global v / max_v (2.5), v_theta / 10, dribbler on
    action = jnp.stack([out_vx / 2.5, out_vy / 2.5, w / 10.0, jnp.asarray(1.0)])
    return jnp.clip(action, -1.0, 1.0)


def pass_endurance_expert(state, brake=40.0, w_max=6.0, base_tol=0.015,
                          w_tol=0.3, lead=0.0125):
    """Scripted SSLPassEndurance policy: state -> action Box(3) in [-1, 1].

    The shooter cannot translate (pass_endurance.py:121-124); the whole
    skill is aim-then-kick under a deadline: the env kills the episode
    after 21 consecutive steps in which the ball's receiver-distance
    changes by < 0.01 m (the "stopped ball" wrong-pass rule), and the
    slow tail of a proportional settle burns that budget (measured death
    at step 20).  So aim time-optimally: command the braking profile
    ``w = sqrt(2 * brake * |err|)`` (bang-bang with ``brake`` kept under
    the drive's 50 rad/s^2 accel clamp), which lands at err ~ 0 in a few
    steps.

    Kick timing: the kick re-fires every physics substep while the ball
    stays in the contact zone, so the release direction is the heading a
    beat AFTER the decision — compensate with ``lead`` seconds of the
    current angular rate.  The kick REPLACES the ball velocity
    (physics/ssl.py), so residual spin does not deflect the ball beyond
    the dribbler-spring lag (~w^2 r / 300, negligible at w < 1).

    Aim tolerance shrinks with receiver distance (kicker face 0.08 m wide).
    """
    world = state.world
    rb = world.robots
    sx, sy, theta, w = rb.x[0], rb.y[0], rb.theta[0], rb.v_theta[0]
    rx, ry = rb.x[1], rb.y[1]

    dist = jnp.hypot(rx - sx, ry - sy)
    aim = jnp.arctan2(ry - sy, rx - sx)
    err = _wrap(aim - theta)

    # braking profile far out, proportional (non-oscillating) near zero —
    # pure sqrt(2 b |err|) overshoots when err ~ w * dt and hunts
    mag = jnp.minimum(
        jnp.sqrt(2.0 * brake * jnp.abs(err)), 30.0 * jnp.abs(err)
    )
    w_des = jnp.sign(err) * jnp.minimum(w_max, mag)

    tol = jnp.clip(base_tol / jnp.maximum(dist, 0.25), 0.006, 0.05)
    seated = rb.infrared[0]  # ball actually on the face (spring lag swings
    # it out of the kick zone during fast rotation — firing then is a whiff)
    ready = (jnp.abs(err - w * lead) < tol) & (jnp.abs(w) < w_tol) & seated

    a_kick = jnp.where(ready, 1.0, 0.0)
    return jnp.stack([w_des / 10.0, a_kick, jnp.asarray(1.0)])
