"""Full-step Pallas kernel for VSS: the ENTIRE env step in one launch.

The XLA path compiles a VSS-v0 batched step into ~15 physics fusions plus a
long tail of small fusions (OU update, command conversion, reward cascade,
spawn placement, auto-reset select, obs build) — each round-tripping HBM.
The physics-only Pallas kernel (ops/pallas_vss.py) showed a 1.48x isolated
win that shrank to +1.3% end-to-end because of world pack/unpack at the
kernel boundary (docs/pallas_full_step_design.md).  This module removes the
boundary entirely:

  - Env state lives in KERNEL LAYOUT across the whole rollout: one
    ``(S, B)`` f32 tensor whose rows are the state fields, batch in the
    lane dimension.  ``pack_vss_state``/``unpack_vss_state`` convert at the
    rollout edges only (reset / final read-out), so per-step marshalling
    amortises to zero.
  - One kernel launch per batch tile computes: OU update -> wheel-command
    conversion (deadzone) -> 5 physics substeps (same math as
    ops/pallas_vss.py) -> reward/termination cascade -> spawn placement for
    reset lanes (one-hot candidate selection, envs/spawn.py semantics) ->
    auto-reset select -> observation build.
  - Noise stays an input (one fused generator call per step outside the
    kernel — the noise-as-input design of envs/base.py), so the kernel is a
    deterministic function and bit-equivalence with the XLA path is
    testable in interpret mode.

Step semantics mirror the reference's template loop (vss/vss_gym_base.py:
72-90: commands -> physics tick -> obs/reward/done) plus gymnasium
TimeLimit truncation and this framework's auto-reset; task formulas are
those of envs/vss.py (reference vss/env_vss/vss_gym.py).

State row layout (N = n_robots):
    0:6         ball x, y, z, v_x, v_y, v_z
    6+0N:6+1N   robot x
    6+1N:6+2N   robot y
    6+2N:6+3N   robot theta
    6+3N:6+4N   robot v_x
    6+4N:6+5N   robot v_y
    6+5N:6+6N   robot v_theta
    6+6N        steps (f32; exact integers well below 2^24)
    7+6N:7+8N   OU state, WHEEL-major: N wheel-0 rows then N wheel-1 rows
                (robot-major interleaving would need strided slices, which
                Mosaic lowers as gathers and rejects)
    7+8N        ball_potential
    8+8N        has_potential (0/1)
    9+8N:15+8N  shaping accumulators (envs/vss._SHAPING_KEYS order)
Total S = 15 + 8N.

Aux output rows: [reward, terminated, truncated, shaping0..5] — the
shaping rows are the PRE-reset accumulators (the step's info dict), while
the state rows hold the post-reset values.

Robot sensor/actuator channels not carried: ``infrared`` is always False
for VSS worlds and ``v_wheel`` (achieved wheel speeds) is a pure function
of the carried body state — ``unpack_vss_state`` recomputes it with the
same epilogue formula as physics/vss.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rsoccer_tpu.core.state import BallState, RobotsState, WorldState
from rsoccer_tpu.envs import spawn as spawn_mod
from rsoccer_tpu.envs.ou import OU_THETA
from rsoccer_tpu.ops.pair_collide import resolve_pair_collisions
from rsoccer_tpu.physics.vss import HALF_AXLE

_EPS = 1e-8


def _wrap_angle(t):
    return jnp.mod(t + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def state_size(n_robots: int) -> int:
    return 15 + 8 * n_robots


def pack_vss_state(state) -> jnp.ndarray:
    """Batched VSSState (lane layout, trailing batch axis) -> (S, B)."""
    w = state.world
    n = w.robots.x.shape[0]
    rows = [
        w.ball.x[None], w.ball.y[None], w.ball.z[None],
        w.ball.v_x[None], w.ball.v_y[None], w.ball.v_z[None],
        w.robots.x, w.robots.y, w.robots.theta,
        w.robots.v_x, w.robots.v_y, w.robots.v_theta,
        state.steps[None].astype(jnp.float32),
        # (N, 2, B) -> wheel-major (2N, B)
        state.ou_x[:, 0, :], state.ou_x[:, 1, :],
        state.ball_potential[None],
        state.has_potential[None].astype(jnp.float32),
        state.shaping,
    ]
    return jnp.concatenate(rows, axis=0)


def unpack_vss_state(arr: jnp.ndarray, n_robots: int, wheel_radius: float):
    """(S, B) -> batched VSSState (lane layout)."""
    from rsoccer_tpu.envs.vss import VSSState

    n = n_robots
    o = 6
    x = arr[o : o + n]; o += n
    y = arr[o : o + n]; o += n
    theta = arr[o : o + n]; o += n
    vx = arr[o : o + n]; o += n
    vy = arr[o : o + n]; o += n
    vth = arr[o : o + n]; o += n
    steps = arr[o].astype(jnp.int32); o += 1
    # wheel-major (2N, B) -> (N, 2, B)
    ou = jnp.stack([arr[o : o + n], arr[o + n : o + 2 * n]], axis=1); o += 2 * n
    pot = arr[o]; o += 1
    has_pot = arr[o] > 0.5; o += 1
    shaping = arr[o : o + 6]

    # achieved wheel speeds: same epilogue as physics/vss.make_vss_step
    u = vx * jnp.cos(theta) + vy * jnp.sin(theta)
    w0 = (u - vth * HALF_AXLE) / wheel_radius
    w1 = (u + vth * HALF_AXLE) / wheel_radius
    v_wheel = jnp.stack([w0, w1, jnp.zeros_like(w0), jnp.zeros_like(w0)], axis=1)

    world = WorldState(
        ball=BallState(
            x=arr[0], y=arr[1], z=arr[2], v_x=arr[3], v_y=arr[4], v_z=arr[5]
        ),
        robots=RobotsState(
            x=x, y=y, theta=theta, v_x=vx, v_y=vy, v_theta=vth,
            infrared=jnp.zeros(x.shape, bool), v_wheel=v_wheel,
        ),
    )
    return VSSState(
        world=world, steps=steps, ou_x=ou,
        ball_potential=pot, has_potential=has_pot, shaping=shaping,
    )


def make_pallas_vss_full_step(
    env,
    batch: int,
    tile: int = 2048,
    interpret: bool | None = None,
    rng: str = "input",
    emit_final_obs: bool = False,
):
    """Build the fused step for a :class:`rsoccer_tpu.envs.vss.VSSEnv`.

    ``rng="input"`` (default): noise is an input —
    ``step(state (S,B), action (A,B), ou_noise (2N,B),
    spawn_u ((1+N)*2*K, B), theta_u (N,B)) -> (state, obs (obs,B),
    aux (9,B))`` with aux rows [reward, term, trunc, shaping0..5].
    Deterministic given the noise, so bit-equivalence with the XLA path is
    testable (interpret mode works on CPU).

    ``emit_final_obs=True`` doubles the obs output to ``(2*obs, B)``: rows
    ``[:obs]`` are the post-auto-reset observation as before, rows
    ``[obs:]`` the FINAL (pre-reset) observation of the step — gymnasium's
    same-step autoreset convention needs it to bootstrap truncated
    episodes (models/ppo._gae, models/sac._collect).  On non-done lanes
    the two halves are identical.

    ``rng="kernel"`` (TPU only): all noise is generated IN the kernel with
    the per-core hardware PRNG (``pltpu.prng_random_bits``), seeded per
    step + per tile — ``step(state, action, seed (1,) int32) -> ...``.
    The ~130 noise rows per env (spawn candidates dominate) then never
    touch HBM: at B=131072 the input-noise path streams ~68 MB of
    generator output through HBM every step.  Uniforms come from the top
    24 bits (exact f32), normals via Box-Muller — same distributions as
    the input path, different stream.

    Layout: the batch axis is viewed as 2-D ``(8, B/8)`` inside the kernel
    so every per-env row is a full ``(8, lanes)`` vreg tile.  With a flat
    ``(T,)`` batch Mosaic lays single rows on one sublane — 1/8 VPU
    utilisation — which measured SLOWER than the XLA path (130us vs 110us
    per step at B=8192).  The remap is a pure index relabelling
    (``b = i*(B/8) + j``), applied identically to every input/output, so
    semantics are untouched and the reshape is layout-free.
    """
    if interpret is None:
        # Mosaic only lowers on TPU; everywhere else interpret mode is the
        # only way to run the kernel (slow, but correct — used by CPU tests)
        interpret = jax.default_backend() != "tpu"
    if batch % tile:
        raise ValueError(f"batch {batch} not divisible by tile {tile}")
    if tile % 8:
        raise ValueError(f"tile {tile} must be a multiple of 8 (sublanes)")
    if rng not in ("input", "kernel"):
        raise ValueError(f"rng must be 'input' or 'kernel', got {rng!r}")

    field = env.field
    cfg = env.physics_cfg
    dt = env.time_step
    n = env.n_robots
    nb = env.n_blue
    K = spawn_mod.N_CANDIDATES
    S = state_size(n)
    obs_size = env.obs_size
    n_act = env.action_size

    # physics constants (identical to ops/pallas_vss.py)
    dts = dt / cfg.n_substeps
    lat_keep = float(jnp.exp(-cfg.lateral_decay * dts))
    a_lin = cfg.robot_accel * dts
    a_ang = cfg.robot_alpha * dts
    max_wheel = field.max_wheel_rad_s
    wheel_r = field.rbt_wheel_radius
    half_len, half_wid = field.half_length, field.half_width
    goal_half = field.goal_width / 2
    goal_depth = field.goal_depth
    r_rbt, r_ball = field.rbt_radius, field.ball_radius

    # task constants (envs/vss.py)
    max_pos, max_v = env.max_pos, env.max_v
    max_w_rad = env.max_w_rad
    nbnd = env.norm_bounds
    deadzone = env.v_wheel_deadzone
    max_steps = float(env.max_episode_steps)
    ou_sig_sqdt = 0.5 * math.sqrt(dt)  # sigma * sqrt(dt), ou.py defaults

    # spawn box (envs/vss.py reset_state)
    x_lo, x_hi = -half_len + 0.1, half_len - 0.1
    y_lo, y_hi = -half_wid + 0.1, half_wid - 0.1
    min_d2 = 0.1 * 0.1

    half_l_pot = half_len + goal_depth  # potential formula constant
    length100 = field.length * 100.0

    # per-substep rotation bound: |w| never exceeds the wheel-limited
    # |w_tgt| (w starts at 0 on reset and moves toward the clipped target
    # by clipped increments; nothing applies angular impulses), so
    # |dtheta| <= w_max * dts.  Within that reduced range deg-7/6 Taylor
    # sin/cos are exact to ~1e-12 — far below f32 resolution — letting the
    # substep loop compose rotations with ~10 mul-adds instead of two
    # transcendental lowerings per robot (measured ~6 us/step at B=8192).
    w_bound = wheel_r * max_wheel / HALF_AXLE
    dth_bound = w_bound * dts
    _fast_rot = dth_bound <= 0.35  # poly error < 1e-9 inside this range

    def compute(st, act, ou_n, sp_u, th_u, st_out, obs_out, aux_out):
        """Shared kernel body; trailing dims of every array are (8, lanes)."""
        bx, by, bz, bvx, bvy, bvz = (st[i] for i in range(6))
        o = 6
        x = st[o : o + n]; o += n
        y = st[o : o + n]; o += n
        theta = st[o : o + n]; o += n
        vx = st[o : o + n]; o += n
        vy = st[o : o + n]; o += n
        w = st[o : o + n]; o += n
        steps = st[o]; o += 1
        ou_x = st[o : o + 2 * n]; o += 2 * n
        ball_pot = st[o]; o += 1
        has_pot = st[o]; o += 1
        shaping = st[o : o + 6]  # (6, T)

        # --- OU update (envs/ou.ou_update: mu=0, sigma=0.5)
        ou_x = ou_x + OU_THETA * (0.0 - ou_x) * dt + ou_sig_sqdt * ou_n  # (2N,T)

        # --- actions: agent action overrides robot 0's OU rows, then the
        # wheel conversion (envs/vss._actions_to_wheels) for all robots
        def to_wheel(a):
            v = jnp.clip(a * max_v, -max_v, max_v)
            v = jnp.where(jnp.abs(v) < deadzone, 0.0, v)
            return v / wheel_r

        # wheel-major OU rows: wheel0 of robots 1..N-1 at rows 1..N-1,
        # wheel1 at rows N+1..2N-1 — contiguous slices only
        wl = to_wheel(jnp.concatenate([act[0:1], ou_x[1:n]], axis=0))  # (N,T)
        wr = to_wheel(jnp.concatenate([act[1:2], ou_x[n + 1 :]], axis=0))

        wl_c = jnp.clip(wl, -max_wheel, max_wheel)
        wr_c = jnp.clip(wr, -max_wheel, max_wheel)
        v_tgt = wheel_r * (wl_c + wr_c) / 2.0
        w_tgt = wheel_r * (wr_c - wl_c) / (2.0 * HALF_AXLE)

        # --- physics substeps (same body as ops/pallas_vss.py).
        # cos/sin of the post-update heading is reused as the next substep's
        # body-frame rotation (bit-identical: same theta value), halving the
        # transcendental count; normals come from one rsqrt + multiplies
        # instead of sqrt + divides (ULP-level difference, under the 5e-5
        # equivalence tolerance of tests/test_pallas_full.py).
        cos_t = jnp.cos(theta)
        sin_t = jnp.sin(theta)
        for _ in range(cfg.n_substeps):
            u = vx * cos_t + vy * sin_t
            s = -vx * sin_t + vy * cos_t
            u = u + jnp.clip(v_tgt - u, -a_lin, a_lin)
            s = s * lat_keep
            w = w + jnp.clip(w_tgt - w, -a_ang, a_ang)
            dth = w * dts
            theta = _wrap_angle(theta + dth)
            if _fast_rot:
                # rotate (cos_t, sin_t) by dth via reduced-range Taylor
                dd = dth * dth
                sin_d = dth * (
                    1.0 + dd * (-1.0 / 6.0 + dd * (1.0 / 120.0 - dd / 5040.0))
                )
                cos_d = 1.0 + dd * (
                    -0.5 + dd * (1.0 / 24.0 - dd / 720.0)
                )
                cos_n = cos_t * cos_d - sin_t * sin_d
                sin_t = sin_t * cos_d + cos_t * sin_d
                cos_t = cos_n
            else:
                cos_t = jnp.cos(theta)
                sin_t = jnp.sin(theta)
            vx = u * cos_t - s * sin_t
            vy = u * sin_t + s * cos_t
            x = x + vx * dts
            y = y + vy * dts

            # robot-robot collisions: shared pair-list resolver
            # (ops/pair_collide.py — one implementation for both leagues)
            x, y, vx, vy = resolve_pair_collisions(
                x, y, vx, vy, r_rbt, cfg.rest_robot_robot
            )

            xl = half_len - r_rbt
            yl = half_wid - r_rbt
            vx = jnp.where((jnp.abs(x) > xl) & (vx * jnp.sign(x) > 0), 0.0, vx)
            vy = jnp.where((jnp.abs(y) > yl) & (vy * jnp.sign(y) > 0), 0.0, vy)
            x = jnp.clip(x, -xl, xl)
            y = jnp.clip(y, -yl, yl)

            on_ground = bz <= r_ball + 1e-4
            inv_speed = jax.lax.rsqrt(bvx * bvx + bvy * bvy + _EPS * _EPS)
            scale = jnp.maximum(
                0.0, 1.0 - cfg.ball_friction_decel * dts * inv_speed
            )
            bvx = jnp.where(on_ground, bvx * scale, bvx)
            bvy = jnp.where(on_ground, bvy * scale, bvy)
            bvz = bvz - cfg.gravity * dts
            bz = bz + bvz * dts
            hit_floor = bz < r_ball
            bvz = jnp.where(
                hit_floor & (bvz < 0.0), -cfg.rest_ball_ground * bvz, bvz
            )
            bvz = jnp.where(hit_floor & (bvz < cfg.ball_bounce_min_v), 0.0, bvz)
            bz = jnp.where(hit_floor, r_ball, bz)
            bx = bx + bvx * dts
            by = by + bvy * dts

            below_top = (bz - r_ball) < cfg.rbt_height
            bdx = bx[None] - x
            bdy = by[None] - y
            bd2 = jnp.maximum(bdx * bdx + bdy * bdy, _EPS * _EPS)
            inv_bd = jax.lax.rsqrt(bd2)
            boverlap = (r_rbt + r_ball) - bd2 * inv_bd
            bcol = (boverlap > 0.0) & below_top[None]
            bnx = bdx * inv_bd
            bny = bdy * inv_bd
            bx = bx + jnp.sum(jnp.where(bcol, boverlap, 0.0) * bnx, axis=0)
            by = by + jnp.sum(jnp.where(bcol, boverlap, 0.0) * bny, axis=0)
            relvx = bvx[None] - vx
            relvy = bvy[None] - vy
            bvn = relvx * bnx + relvy * bny
            bj = jnp.where(
                bcol & (bvn < 0.0), -(1.0 + cfg.rest_ball_robot) * bvn, 0.0
            )
            bvx = bvx + jnp.sum(bj * bnx, axis=0)
            bvy = bvy + jnp.sum(bj * bny, axis=0)

            in_mouth = jnp.abs(by) < goal_half
            x_wall = jnp.where(in_mouth, half_len + goal_depth, half_len) - r_ball
            sx = jnp.sign(bx)
            hit_x = jnp.abs(bx) > x_wall
            bx = jnp.where(hit_x, sx * x_wall, bx)
            bvx = jnp.where(
                hit_x & (bvx * sx > 0.0), -cfg.rest_ball_wall * bvx, bvx
            )
            in_pocket = jnp.abs(bx) > half_len
            y_wall = jnp.where(in_pocket, goal_half, half_wid) - r_ball
            sy = jnp.sign(by)
            hit_y = jnp.abs(by) > y_wall
            by = jnp.where(hit_y, sy * y_wall, by)
            bvy = jnp.where(
                hit_y & (bvy * sy > 0.0), -cfg.rest_ball_wall * bvy, bvy
            )

        # --- reward & termination cascade (envs/vss.post_physics;
        # reference vss_gym.py:144-192)
        goal_blue = bx > half_len
        goal_yellow = bx < -half_len
        goal = goal_blue | goal_yellow

        dx_d = (half_l_pot + bx) * 100.0
        dx_a = (half_l_pot - bx) * 100.0
        dyc = by * 100.0
        dist_1 = -jnp.sqrt(dx_a * dx_a + 2.0 * dyc * dyc)
        dist_2 = jnp.sqrt(dx_d * dx_d + 2.0 * dyc * dyc)
        potential = ((dist_1 + dist_2) / length100 - 1.0) / 2.0
        grad = jnp.where(
            has_pot > 0.5,
            jnp.clip((potential - ball_pot) * 3.0 / dt, -5.0, 5.0),
            0.0,
        )

        r0x, r0y = x[0], y[0]
        rbx, rby = bx - r0x, by - r0y
        inv_rb = jax.lax.rsqrt(
            jnp.maximum(rbx * rbx + rby * rby, 1e-16)
        )
        rbx = rbx * inv_rb
        rby = rby * inv_rb
        move = rbx * vx[0] + rby * vy[0]
        move = jnp.clip(move / 0.4, -5.0, 5.0)

        energy = -(jnp.abs(wl[0]) + jnp.abs(wr[0]))

        w_move, w_grad, w_energy = 0.2, 0.8, 2e-4
        shaped = w_move * move + w_grad * grad + w_energy * energy
        reward = jnp.where(goal_blue, 10.0, jnp.where(goal_yellow, -10.0, shaped))

        goal_f = goal.astype(jnp.float32)
        goal_b_f = goal_blue.astype(jnp.float32)
        goal_y_f = goal_yellow.astype(jnp.float32)
        zero = jnp.zeros_like(shaped)
        shaping_new = shaping + jnp.stack([
            jnp.where(goal, jnp.where(goal_blue, 1.0, -1.0), 0.0),
            jnp.where(goal, 0.0, w_move * move),
            jnp.where(goal, 0.0, w_grad * grad),
            jnp.where(goal, 0.0, w_energy * energy),
            jnp.where(goal, goal_b_f, zero),
            jnp.where(goal, goal_y_f, zero),
        ])

        steps_new = steps + 1.0
        trunc = steps_new >= max_steps
        done = goal | trunc
        done_f = done.astype(jnp.float32)

        def npos(v):
            return jnp.clip(v / max_pos, -nbnd, nbnd)

        def nv(v):
            return jnp.clip(v / max_v, -nbnd, nbnd)

        def nw(v):
            return jnp.clip(v / max_w_rad, -nbnd, nbnd)

        # final (pre-reset) observation from the post-physics state; the
        # heading trig is the substep loop's carried rotation (same values
        # the physics used — within the kernel equivalence tolerance)
        final_rows = []
        if emit_final_obs:
            final_rows = [npos(bx), npos(by), nv(bvx), nv(bvy)]
            for i in range(nb):
                final_rows += [
                    npos(x[i]), npos(y[i]), sin_t[i], cos_t[i],
                    nv(vx[i]), nv(vy[i]), nw(w[i]),
                ]
            for i in range(nb, n):
                final_rows += [
                    npos(x[i]), npos(y[i]), nv(vx[i]), nv(vy[i]), nw(w[i])
                ]

        # --- spawn placement for reset lanes (envs/spawn.place_separated
        # with one-hot first-valid selection; 1 ball + N robots, K cands)
        px = []
        py = []
        for i in range(1 + n):
            base = i * 2 * K
            cx = x_lo + sp_u[base : base + K] * (x_hi - x_lo)        # (K,T)
            cy = y_lo + sp_u[base + K : base + 2 * K] * (y_hi - y_lo)
            if not px:
                # no placed points yet: first candidate wins
                px.append(cx[0])
                py.append(cy[0])
                continue
            ok = None
            for qx, qy in zip(px, py):
                ddx = cx - qx[None]
                ddy = cy - qy[None]
                good = (ddx * ddx + ddy * ddy) >= min_d2
                ok = good if ok is None else (ok & good)
            # first True via running-OR one-hot (cumsum==1 equivalent)
            seen = jnp.zeros_like(ok[0])
            sel_x = jnp.zeros_like(cx[0])
            sel_y = jnp.zeros_like(cy[0])
            any_ok = jnp.zeros_like(ok[0])
            for k in range(K):
                first_k = ok[k] & ~seen
                seen = seen | ok[k]
                any_ok = any_ok | ok[k]
                sel_x = jnp.where(first_k, cx[k], sel_x)
                sel_y = jnp.where(first_k, cy[k], sel_y)
            px.append(jnp.where(any_ok, sel_x, cx[0]))
            py.append(jnp.where(any_ok, sel_y, cy[0]))

        reset_theta = th_u * (2.0 * jnp.pi)  # (N,T)
        reset_rx = jnp.stack(px[1:])  # (N,T)
        reset_ry = jnp.stack(py[1:])

        # --- auto-reset select (done lanes take the freshly spawned world)
        def sel(reset_v, next_v):
            return jnp.where(done, reset_v, next_v)

        bx = sel(px[0], bx)
        by = sel(py[0], by)
        bz = sel(jnp.full_like(bz, r_ball), bz)
        bvx = sel(zero, bvx)
        bvy = sel(zero, bvy)
        bvz = sel(zero, bvz)
        x = jnp.where(done[None], reset_rx, x)
        y = jnp.where(done[None], reset_ry, y)
        theta = jnp.where(done[None], reset_theta, theta)
        vx = jnp.where(done[None], 0.0, vx)
        vy = jnp.where(done[None], 0.0, vy)
        w = jnp.where(done[None], 0.0, w)
        steps_out = jnp.where(done, 0.0, steps_new)
        ou_out = jnp.where(done[None], 0.0, ou_x)
        pot_out = jnp.where(done, 0.0, potential)
        has_out = jnp.where(done, 0.0, 1.0)
        shaping_out = jnp.where(done[None], 0.0, shaping_new)

        # --- observation from the post-select state (envs/vss._observe)
        obs_rows = [npos(bx), npos(by), nv(bvx), nv(bvy)]
        for i in range(nb):
            obs_rows += [
                npos(x[i]), npos(y[i]),
                jnp.sin(theta[i]), jnp.cos(theta[i]),
                nv(vx[i]), nv(vy[i]), nw(w[i]),
            ]
        for i in range(nb, n):
            obs_rows += [npos(x[i]), npos(y[i]), nv(vx[i]), nv(vy[i]), nw(w[i])]

        st_out[...] = jnp.concatenate(
            [
                jnp.stack([bx, by, bz, bvx, bvy, bvz]),
                x, y, theta, vx, vy, w,
                steps_out[None],
                ou_out,
                pot_out[None],
                has_out[None],
                shaping_out,
            ],
            axis=0,
        )
        obs_out[...] = jnp.stack(obs_rows + final_rows)
        aux_out[...] = jnp.concatenate(
            [
                jnp.stack([reward, goal_f, trunc.astype(jnp.float32)]),
                shaping_new,
            ],
            axis=0,
        )

    # batch viewed as (8, B/8); each grid step covers a (8, tile/8) slab
    b8 = batch // 8
    tl = tile // 8
    if b8 % tl:
        raise ValueError(f"batch/8 {b8} not divisible by tile/8 {tl}")
    grid = (b8 // tl,)
    n_sp = (1 + n) * 2 * K
    obs_out_n = 2 * obs_size if emit_final_obs else obs_size

    out_shape = [
        jax.ShapeDtypeStruct((S, 8, b8), jnp.float32),
        jax.ShapeDtypeStruct((obs_out_n, 8, b8), jnp.float32),
        jax.ShapeDtypeStruct((9, 8, b8), jnp.float32),
    ]

    def r3(a):
        return a.reshape(a.shape[0], 8, b8)

    if rng == "input":

        def kernel(st_ref, act_ref, ou_ref, spawn_ref, th_ref,
                   st_out, obs_out, aux_out):
            compute(
                st_ref[...], act_ref[...], ou_ref[...], spawn_ref[...],
                th_ref[...], st_out, obs_out, aux_out,
            )

        def spec(rows):
            return pl.BlockSpec((rows, 8, tl), lambda i: (0, 0, i))

        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(S), spec(n_act), spec(2 * n), spec(n_sp), spec(n)],
            out_specs=[spec(S), spec(obs_out_n), spec(9)],
            out_shape=out_shape,
            interpret=interpret,
        )

        def step(state, action, ou_noise, spawn_u, theta_u):
            st, obs, aux = call(
                r3(state), r3(action), r3(ou_noise), r3(spawn_u), r3(theta_u)
            )
            return (
                st.reshape(S, batch),
                obs.reshape(obs_out_n, batch),
                aux.reshape(9, batch),
            )

        return step

    # rng == "kernel": hardware PRNG inside the kernel
    if interpret:
        # pltpu.prng_* has no working CPU interpret path (jax's interpret
        # lowering trips on the nested closed_call); keep the error clear
        raise NotImplementedError(
            "rng='kernel' (in-kernel hardware RNG) requires a TPU backend; "
            "use rng='input' off-TPU"
        )
    from jax.experimental.pallas import tpu as pltpu

    n_nrm = 2 * n  # OU rows
    # spawn-candidate uniforms are packed two-per-u32 (16-bit resolution:
    # ~0.02 mm over the field span — far below any physical scale, and the
    # kernel-RNG stream is documented as its own stream anyway); heading +
    # Box-Muller uniforms keep the full 24 bits
    n_sp_half = -(-n_sp // 2)
    n_bits = n_sp_half + n + 2 * n_nrm
    two24 = 2.0 ** -24  # plain float: jnp scalars would be captured consts
    two16 = 2.0 ** -16

    def kernel_rng(seed_ref, st_ref, act_ref, st_out, obs_out, aux_out):
        # distinct stream per step and per tile: both 32-bit words of the
        # step key are hashed, with the tile id folded into the first.
        # (A single 32-bit word + program_id had a birthday-bound collision
        # across steps — two step seeds closer than the grid size replay a
        # whole tile's noise block; a full 64-bit key makes that
        # negligible.  Exactly TWO operands: three crash this Mosaic
        # version's compiler.)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((n_bits, 8, tl)), jnp.uint32
        )
        # (casts via int32: Mosaic has no u32 -> f32 lowering; shifted /
        # masked values fit in 24 or 16 bits so the sign is never set)
        sp_bits = bits[:n_sp_half]
        sp_u = jnp.concatenate(
            [
                (sp_bits >> jnp.uint32(16)).astype(jnp.int32),
                (sp_bits & jnp.uint32(0xFFFF)).astype(jnp.int32),
            ],
            axis=0,
        )[:n_sp].astype(jnp.float32) * two16
        # top 24 bits -> uniform [0, 1) exactly representable in f32
        uni = (
            (bits[n_sp_half:] >> jnp.uint32(8))
            .astype(jnp.int32)
            .astype(jnp.float32)
            * two24
        )
        th_u = uni[:n]
        u1 = jnp.maximum(uni[n : n + n_nrm], 1e-7)
        u2 = uni[n + n_nrm :]
        ou_n = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
        compute(st_ref[...], act_ref[...], ou_n, sp_u, th_u,
                st_out, obs_out, aux_out)

    def pspec(rows):
        # PrefetchScalarGridSpec index maps receive the scalar ref too
        return pl.BlockSpec((rows, 8, tl), lambda i, s: (0, 0, i))

    call = pl.pallas_call(
        kernel_rng,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pspec(S), pspec(n_act)],
            out_specs=[pspec(S), pspec(obs_out_n), pspec(9)],
        ),
        out_shape=out_shape,
        interpret=interpret,
    )

    def step_rng(state, action, seed):
        st, obs, aux = call(seed, r3(state), r3(action))
        return (
            st.reshape(S, batch),
            obs.reshape(obs_out_n, batch),
            aux.reshape(9, batch),
        )

    return step_rng
