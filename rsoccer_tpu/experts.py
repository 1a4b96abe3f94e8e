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

import jax
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


def static_defenders_expert(
    state,
    field,
    kp=3.0,
    kw=5.0,
    w_max=6.0,
    fetch_speed=1.5,
    carry_speed=0.7,
    avoid_radius=0.45,
    avoid_gain=3.0,
    brake=40.0,
    w_tol=0.5,
    n_targets=9,
):
    """Scripted SSLStaticDefenders policy: state -> action Box(5) in [-1,1].

    Strategy (branch-free):

    1. **Shot selection** — ``n_targets`` candidate aim points spread
       across the goal mouth; for each, the clearance of the ball->target
       segment from every defender; pick the widest lane (ties break
       toward the goal center).
    2. **Fetch** (no ball): face-point control onto a pre-point ~0.14 m
       BEHIND the ball along the shot line (so capture leaves the robot
       aimed goalward), switching to the ball itself once roughly behind
       it; dribbler on.
    3. **Carry/aim** (infrared): rotate onto the shot line with the
       time-optimal braking profile (see pass_endurance_expert); push
       toward the goal at ``carry_speed`` while aligned.  Defender
       repulsion steers around contact (any touched defender that moves
       does NOT terminate here — unlike Dribbling — but contact risks
       knocking the ball out).
    4. **Kick** gated on the ACTUAL release heading: the predicted
       goal-line crossing must land inside the mouth with a post margin
       and the heading ray must clear every defender.
    5. **Safety clamps** — never command into the GK area (terminal,
       static_defenders.py:183-186) or the field margins.

    ``field`` is the env's FieldParams (geometry enters symbolically, no
    hard-coded dimensions).  Completes the reference task by construction
    — regression-tested in tests/test_experts.py — and provides the BC
    seed for the close-quarters skill prior (docs/training.md).
    """
    f = field
    world = state.world
    rb = world.robots
    rx, ry, theta, w = rb.x[0], rb.y[0], rb.theta[0], rb.v_theta[0]
    bx, by = world.ball.x, world.ball.y
    dx, dy = rb.x[1:], rb.y[1:]  # (6,) static defenders

    half_len, half_wid = f.half_length, f.half_width
    half_goal = f.goal_width / 2

    # ---- 1. widest shooting lane ------------------------------------
    ty = jnp.linspace(-0.8, 0.8, n_targets) * half_goal  # candidate aims
    gx = half_len + 0.02
    # distance of each defender to each segment ball -> (gx, ty_k)
    sx_ = jnp.full_like(ty, gx - bx)  # (K,) — same x reach for every lane
    sy_ = ty - by  # (K,)
    seg_len2 = jnp.maximum(sx_**2 + sy_**2, 1e-6)
    # projection parameter t of each defender onto each segment: (K, 6)
    t = ((dx[None, :] - bx) * sx_[:, None] + (dy[None, :] - by) * sy_[:, None]) / seg_len2[:, None]
    t = jnp.clip(t, 0.0, 1.0)
    px = bx + t * sx_[:, None]
    py = by + t * sy_[:, None]
    clr = jnp.min(
        jnp.hypot(dx[None, :] - px, dy[None, :] - py), axis=1
    )  # (K,) lane clearance
    # prefer central targets on ties: tiny centrality bonus
    score = clr - 0.02 * jnp.abs(ty) / jnp.maximum(half_goal, 1e-6)
    # SOFT lane choice: clearance-softmax instead of argmax.  An argmax
    # flips the aim discontinuously under tiny obs changes, which makes
    # the state->action mapping effectively multimodal and un-clonable
    # (MSE regression averages the lanes; the argmax expert cloned to 9%).
    # At aim_tau -> 0 this recovers the argmax.
    wts = jax.nn.softmax(score / 0.08)
    aim_y = jnp.sum(wts * ty)

    shot_dir = jnp.arctan2(aim_y - by, gx - bx)  # ball -> goal lane
    c_dir, s_dir = jnp.cos(shot_dir), jnp.sin(shot_dir)

    # ---- 2. fetch ----------------------------------------------------
    c, s = jnp.cos(theta), jnp.sin(theta)
    fx, fy = rx + _FACE * c, ry + _FACE * s
    has_ball = rb.infrared[0]

    pre_x, pre_y = bx - 0.14 * c_dir, by - 0.14 * s_dir  # behind the ball
    behind = (
        jnp.hypot(rx - pre_x, ry - pre_y) < 0.12
    ) | (((rx - bx) * c_dir + (ry - by) * s_dir) < -0.05)
    tgt_x = jnp.where(behind, bx, pre_x)
    tgt_y = jnp.where(behind, by, pre_y)
    vx_f = kp * (tgt_x - fx)
    vy_f = kp * (tgt_y - fy)
    fetch_theta = jnp.arctan2(by - ry, bx - rx)

    # ---- 3. carry / aim ---------------------------------------------
    err = _wrap(shot_dir - theta)
    aligned = jnp.clip(jnp.cos(err), 0.0, 1.0) ** 2
    vx_c = carry_speed * aligned * c_dir
    vy_c = carry_speed * aligned * s_dir

    vx = jnp.where(has_ball, vx_c, vx_f)
    vy = jnp.where(has_ball, vy_c, vy_f)
    head_err = jnp.where(has_ball, err, _wrap(fetch_theta - theta))

    # defender repulsion (both phases): steer around nearby defenders
    dd = jnp.hypot(rx - dx, ry - dy)
    push = jnp.maximum(0.0, avoid_radius - dd) / avoid_radius  # (6,)
    vx = vx + avoid_gain * jnp.sum(push * (rx - dx) / jnp.maximum(dd, 1e-3))
    vy = vy + avoid_gain * jnp.sum(push * (ry - dy) / jnp.maximum(dd, 1e-3))

    # ---- 5. safety clamps -------------------------------------------
    # GK area is terminal for the ROBOT: proportional barrier caps the
    # inward velocity so the approach can come arbitrarily close to the
    # line without ever crossing it (a hard vx=0 clamp deadlocks fetches
    # of balls spawned near the area edge)
    gk_limit = half_len - f.penalty_length - 0.15
    band_hi = f.penalty_width / 2 + 0.12
    in_gk_band = jnp.abs(ry) < band_hi
    vx = jnp.where(in_gk_band, jnp.minimum(vx, 4.0 * (gk_limit - rx)), vx)
    # ...and bar SIDE entry: when already deeper than the x barrier, cap
    # the lateral velocity toward the band the same way
    in_deep = rx > gk_limit
    vy = jnp.where(
        in_deep & (ry > 0), jnp.maximum(vy, -4.0 * (ry - band_hi)), vy
    )
    vy = jnp.where(
        in_deep & (ry <= 0), jnp.minimum(vy, 4.0 * (-ry - band_hi)), vy
    )
    # field margins (robot out is terminal at x < -0.2 / |y| > half_wid)
    vx = jnp.maximum(vx, 4.0 * (0.05 - rx))
    vy = jnp.where(
        jnp.abs(ry) > half_wid - 0.15,
        jnp.where(ry > 0, jnp.minimum(vy, 0.0), jnp.maximum(vy, 0.0)),
        vy,
    )

    v_norm = jnp.hypot(vx, vy)
    cap = jnp.where(has_ball, carry_speed, fetch_speed)
    scale = jnp.minimum(1.0, cap / jnp.maximum(v_norm, 1e-8))
    vx, vy = vx * scale, vy * scale

    # time-optimal rotate (see pass_endurance_expert)
    mag = jnp.minimum(
        jnp.sqrt(2.0 * brake * jnp.abs(head_err)), 30.0 * jnp.abs(head_err)
    )
    w_des = jnp.sign(head_err) * jnp.minimum(w_max, mag)

    # ---- 4. kick gate: exact, on the ACTUAL heading -----------------
    # The kick releases the ball along the robot's heading (it REPLACES
    # ball velocity, physics/ssl.py), so gate on where THIS heading sends
    # it — not on the intended lane: (a) the predicted goal-line crossing
    # must be inside the mouth with a post margin, and (b) the heading ray
    # must clear every defender by more than a robot+ball radius.
    hx, hy = jnp.cos(theta), jnp.sin(theta)
    reach = (half_len - bx) / jnp.maximum(hx, 0.05)
    y_pred = by + hy * reach
    on_target = (hx > 0.2) & (jnp.abs(y_pred) < half_goal - 0.06)
    t_ray = jnp.clip(
        ((dx - bx) * hx + (dy - by) * hy), 0.0, jnp.maximum(reach, 0.0)
    )
    ray_clear = jnp.min(
        jnp.hypot(dx - (bx + t_ray * hx), dy - (by + t_ray * hy))
    )
    kick = (
        has_ball
        & on_target
        & (jnp.abs(w) < w_tol)
        & (ray_clear > 0.16)
    )

    action = jnp.stack([
        vx / 2.5, vy / 2.5, w_des / 10.0,
        # +-1 (not {0,1}): the env's kick gate is a3 > 0, and a symmetric
        # binary target keeps an MSE-cloned head safely on the right side
        # of the threshold (a {0,1} target regresses the rare kick=1 class
        # toward 0 and the clone never fires — measured 5% clone vs 96%
        # expert with identical per-dim residuals)
        jnp.where(kick, 1.0, -1.0), jnp.asarray(1.0),
    ])
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
