"""Full-step Pallas kernels for the SSL tasks.

Same architecture as ops/pallas_vss_full.py (see its docstring for the
layout story: batch viewed as ``(8, B/8)`` so every per-env row is a full
vreg tile; state resident in kernel layout across the rollout): one kernel
launch per batch tile computes command conversion, the 4-omni physics with
kicker/dribbler/infrared (physics/ssl.py semantics), the task's
reward/termination cascade, spawn placement for reset lanes, auto-reset
select, and the observation build.

SSLStaticDefenders-v0 is implemented first — it was the slowest env on the
XLA path (56.6M steps/s vs 90-116M for the other SSL tasks; STATUS.md) and
its per-step reset-spawn tail is exactly what in-VMEM fusion removes.

Task semantics mirrored from envs/ssl_static_defenders.py (reference
ssl/ssl_hw_challenge/static_defenders.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from rsoccer_tpu.core.state import BallState, RobotsState, WorldState
from rsoccer_tpu.envs import spawn as spawn_mod
from rsoccer_tpu.ops.pair_collide import resolve_pair_collisions
from rsoccer_tpu.physics.ssl import wheel_jacobian

_EPS = 1e-8


def _wrap_angle(t):
    return jnp.mod(t + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def _atan2(y, x):
    """Polynomial atan2 — Mosaic has no atan2 lowering.  Minimax atan on
    [0,1] + octant reduction; max error ~2e-6 rad, well inside the
    kernel-vs-XLA equivalence tolerance (5e-5)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    a = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), _EPS)
    s = a * a
    r = a * (
        0.99997726
        + s
        * (
            -0.33262347
            + s
            * (
                0.19354346
                + s * (-0.11643287 + s * (0.05265332 + s * -0.01172120))
            )
        )
    )
    r = jnp.where(swap, jnp.pi / 2 - r, r)
    r = jnp.where(x < 0.0, jnp.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _first_valid(cx, cy, placed, min_d2):
    """First candidate (axis 0) at least sqrt(min_d2) from every placed
    point; falls back to candidate 0 (envs/spawn.pick_first semantics)."""
    ok = None
    for qx, qy in placed:
        ddx = cx - qx[None]
        ddy = cy - qy[None]
        good = (ddx * ddx + ddy * ddy) >= min_d2
        ok = good if ok is None else (ok & good)
    if ok is None:
        return cx[0], cy[0]
    seen = jnp.zeros_like(ok[0])
    any_ok = jnp.zeros_like(ok[0])
    sel_x = jnp.zeros_like(cx[0])
    sel_y = jnp.zeros_like(cy[0])
    for k in range(cx.shape[0]):
        first_k = ok[k] & ~seen
        seen = seen | ok[k]
        any_ok = any_ok | ok[k]
        sel_x = jnp.where(first_k, cx[k], sel_x)
        sel_y = jnp.where(first_k, cy[k], sel_y)
    return jnp.where(any_ok, sel_x, cx[0]), jnp.where(any_ok, sel_y, cy[0])


def make_ssl_physics_body(field, cfg, dt: float, n_substeps: int):
    """In-kernel SSL world step (physics/ssl.py substep semantics).

    Returns ``physics(x, y, theta, vx, vy, w, ball6, tgt3, kick_vx,
    kick_vz, dribbler) -> (x, y, theta, vx, vy, w, ball6, infrared)``
    where robot arrays are (N, ...), ball6 is the 6-tuple of ball rows,
    tgt3 = (tu, tv, tw) local-frame velocity targets per robot.
    """
    dts = dt / n_substeps
    a_lin = cfg.robot_accel * dts
    a_ang = cfg.robot_alpha * dts
    r_rbt, r_ball = field.rbt_radius, field.ball_radius
    face_dist = field.rbt_distance_center_kicker
    half_kick_w = field.rbt_kicker_width / 2
    contact_lo = face_dist - field.rbt_kicker_thickness - r_ball
    contact_hi = face_dist + r_ball + cfg.kicker_depth_slack

    def _face_zone(x, y, cos_t, sin_t, bx, by, bz, hi):
        dx = bx[None] - x
        dy = by[None] - y
        lx = dx * cos_t + dy * sin_t
        ly = -dx * sin_t + dy * cos_t
        low = (bz - r_ball) <= cfg.kicker_height
        return (
            (lx >= contact_lo)
            & (lx <= hi)
            & (jnp.abs(ly) <= half_kick_w)
            & low[None]
        )

    def ball_contact(x, y, cos_t, sin_t, bx, by, bz):
        return _face_zone(x, y, cos_t, sin_t, bx, by, bz, contact_hi)

    def ball_in_reach(x, y, cos_t, sin_t, bx, by, bz):
        # dribbler attraction zone (pull only) — physics/ssl.py semantics
        return _face_zone(
            x, y, cos_t, sin_t, bx, by, bz, contact_hi + cfg.dribbler_reach
        )

    def physics(
        x, y, theta, vx, vy, w, ball6, tgt3, kick_vx, kick_vz, dribbler,
        trig0=None, n_active=None,
    ):
        """Returns ``(x, y, theta, vx, vy, w, ball6, infrared,
        (cos_t, sin_t))`` — the final heading trig rows are exposed so task
        epilogues (energy term, observation build) reuse them instead of
        re-lowering transcendentals.  ``trig0`` optionally supplies
        ``(cos(theta), sin(theta))`` if the caller already computed them.

        ``n_active`` (static) is the number of leading robot rows that can
        receive a nonzero angular command.  Rows beyond it are contractually
        angularly static (zero ``tw``, ``w`` starts at 0 on reset, and
        nothing applies angular impulses, so ``w`` stays exactly 0 and
        their heading trig never changes) — every reference SSL task
        commands robot 0 only.  Active rows get EXACT sin/cos each substep
        — correct at any command magnitude (the reference's SSL conversion
        deliberately does not clip v_theta) — while the static majority
        rides the carried trig, so the transcendental cost is
        ``n_active``/``n`` of the naive loop."""
        bx, by, bz, bvx, bvy, bvz = ball6
        tu, tv, tw = tgt3
        contact_after = None
        n = x.shape[0]
        if n_active is None:
            n_active = n
        if trig0 is None:
            cos_t = jnp.cos(theta)
            sin_t = jnp.sin(theta)
        else:
            cos_t, sin_t = trig0
        for _ in range(n_substeps):
            u = vx * cos_t + vy * sin_t
            s = -vx * sin_t + vy * cos_t
            u = u + jnp.clip(tu - u, -a_lin, a_lin)
            s = s + jnp.clip(tv - s, -a_lin, a_lin)
            w = w + jnp.clip(tw - w, -a_ang, a_ang)
            theta = _wrap_angle(theta + w * dts)
            if n_active >= n:
                cos_t = jnp.cos(theta)
                sin_t = jnp.sin(theta)
            else:
                cos_t = jnp.concatenate(
                    [jnp.cos(theta[:n_active]), cos_t[n_active:]], axis=0
                )
                sin_t = jnp.concatenate(
                    [jnp.sin(theta[:n_active]), sin_t[n_active:]], axis=0
                )
            vx = u * cos_t - s * sin_t
            vy = u * sin_t + s * cos_t
            x = x + vx * dts
            y = y + vy * dts

            # robot-robot collisions: shared pair-list resolver
            x, y, vx, vy = resolve_pair_collisions(
                x, y, vx, vy, r_rbt, cfg.rest_robot_robot
            )

            # ball: friction (grounded), dribbler pull, vertical, integrate
            on_ground = bz <= r_ball + 1e-4
            inv_speed = jax.lax.rsqrt(bvx * bvx + bvy * bvy + _EPS * _EPS)
            scale = jnp.maximum(
                0.0, 1.0 - cfg.ball_friction_decel * dts * inv_speed
            )
            fvx = bvx * scale
            fvy = bvy * scale
            bvx = jnp.where(on_ground, fvx, bvx)
            bvy = jnp.where(on_ground, fvy, bvy)

            cos_n = cos_t
            sin_n = sin_t
            contact = ball_in_reach(x, y, cos_n, sin_n, bx, by, bz)
            held = contact & dribbler
            face_x = x + face_dist * cos_n
            face_y = y + face_dist * sin_n
            # damping vs the FACE POINT velocity (incl. omega x r) so a
            # turning robot carries the ball — physics/ssl.py semantics
            face_vx = vx - w * face_dist * sin_n
            face_vy = vy + w * face_dist * cos_n
            rel_vx = bvx[None] - face_vx
            rel_vy = bvy[None] - face_vy
            rel_speed = jnp.sqrt(rel_vx * rel_vx + rel_vy * rel_vy)
            can_hold = held & (rel_speed < cfg.dribbler_capture_speed)
            pull_x = jnp.sum(
                jnp.where(
                    can_hold,
                    cfg.dribbler_pull_accel * (face_x - bx[None])
                    - cfg.dribbler_damping * rel_vx,
                    0.0,
                ),
                axis=0,
            )
            pull_y = jnp.sum(
                jnp.where(
                    can_hold,
                    cfg.dribbler_pull_accel * (face_y - by[None])
                    - cfg.dribbler_damping * rel_vy,
                    0.0,
                ),
                axis=0,
            )
            bvx = bvx + pull_x * dts
            bvy = bvy + pull_y * dts

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
            # dribbler-face absorption: rest_dribbler instead of the body
            # restitution when the ball strikes a dribbling robot's kicker
            # sector (pre-resolve position) — physics/ssl.py semantics
            face_in = ball_contact(x, y, cos_n, sin_n, bx, by, bz)
            rest = jnp.where(
                face_in & dribbler, cfg.rest_dribbler, cfg.rest_ball_robot
            )
            bj = jnp.where(
                bcol & (bvn < 0.0), -(1.0 + rest) * bvn, 0.0
            )
            bvx = bvx + jnp.sum(bj * bnx, axis=0)
            bvy = bvy + jnp.sum(bj * bny, axis=0)

            contact_after = ball_contact(x, y, cos_n, sin_n, bx, by, bz)
            kicking = contact_after & (kick_vx > 0.0)
            kvx = jnp.sum(jnp.where(kicking, kick_vx * cos_n, 0.0), axis=0)
            kvy = jnp.sum(jnp.where(kicking, kick_vx * sin_n, 0.0), axis=0)
            kvz = jnp.sum(jnp.where(kicking, kick_vz, 0.0), axis=0)
            any_kick = jnp.sum(kicking.astype(jnp.float32), axis=0) > 0.0
            bvx = jnp.where(any_kick, kvx, bvx)
            bvy = jnp.where(any_kick, kvy, bvy)
            bvz = jnp.where(any_kick & (kvz > 0.0), kvz, bvz)

        return (
            x, y, theta, vx, vy, w,
            (bx, by, bz, bvx, bvy, bvz), contact_after, (cos_t, sin_t),
        )

    return physics


def _build_call(
    compute,
    *,
    S: int,
    n_act: int,
    obs_size: int,
    aux_rows: int,
    noise_rows: list[int],
    batch: int,
    tile: int,
    interpret: bool | None,
    rng: str,
):
    """Shared pallas plumbing for the SSL task kernels.

    ``compute(st, act, noise_list, st_out, obs_out, aux_out)`` is the task
    body; ``noise_rows`` gives the per-input uniform row counts.  Returns
    ``step(state, action, *noise)`` (input mode) or
    ``step(state, action, seed)`` (kernel mode, uniforms drawn in-kernel).
    Batch viewed as (8, B/8) — see ops/pallas_vss_full.py.
    """
    if interpret is None:
        # Mosaic only lowers on TPU; everywhere else interpret mode is the
        # only way to run the kernel (slow, but correct — used by CPU tests)
        interpret = jax.default_backend() != "tpu"
    if batch % tile or tile % 8:
        raise ValueError(f"bad batch/tile: {batch}/{tile}")
    if rng not in ("input", "kernel"):
        raise ValueError(f"rng must be 'input' or 'kernel', got {rng!r}")
    b8 = batch // 8
    tl = tile // 8
    if b8 % tl:
        raise ValueError(f"batch/8 {b8} not divisible by tile/8 {tl}")
    grid = (b8 // tl,)

    out_shape = [
        jax.ShapeDtypeStruct((S, 8, b8), jnp.float32),
        jax.ShapeDtypeStruct((obs_size, 8, b8), jnp.float32),
        jax.ShapeDtypeStruct((aux_rows, 8, b8), jnp.float32),
    ]

    def r3(a):
        return a.reshape(a.shape[0], 8, b8)

    def out3(st, obs, aux):
        return (
            st.reshape(S, batch),
            obs.reshape(obs_size, batch),
            aux.reshape(aux_rows, batch),
        )

    n_uni = sum(noise_rows)
    if rng == "input" or n_uni == 0:

        def kernel(*refs):
            ins = refs[: 2 + len(noise_rows)]
            outs = refs[2 + len(noise_rows) :]
            compute(
                ins[0][...], ins[1][...], [r[...] for r in ins[2:]], *outs
            )

        def spec(rows):
            return pl.BlockSpec((rows, 8, tl), lambda i: (0, 0, i))

        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(S), spec(n_act)] + [spec(r) for r in noise_rows],
            out_specs=[spec(S), spec(obs_size), spec(aux_rows)],
            out_shape=out_shape,
            interpret=interpret,
        )

        if rng == "input":

            def step(state, action, *noise):
                return out3(*call(r3(state), r3(action), *map(r3, noise)))

            return step

        # rng == "kernel" with no noise inputs: identical program, but the
        # caller passes a (unused) seed for interface uniformity
        def step_seedless(state, action, seed):
            return out3(*call(r3(state), r3(action)))

        return step_seedless

    if interpret:
        # pltpu.prng_* has no working CPU interpret path (jax's interpret
        # lowering trips on the nested closed_call); keep the error clear
        raise NotImplementedError(
            "rng='kernel' (in-kernel hardware RNG) requires a TPU backend; "
            "use rng='input' off-TPU"
        )
    from jax.experimental.pallas import tpu as pltpu

    two24 = 2.0 ** -24

    def kernel_rng(seed_ref, st_ref, act_ref, st_out, obs_out, aux_out):
        # both key words hashed, tile id folded into the first (see
        # ops/pallas_vss_full.py kernel_rng for the collision rationale
        # and the two-operand compiler constraint)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
        bits = pltpu.bitcast(pltpu.prng_random_bits((n_uni, 8, tl)), jnp.uint32)
        # via int32: Mosaic has no u32 -> f32 lowering; 24-bit value is safe
        uni = (
            (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
            * two24
        )
        noise, off = [], 0
        for r in noise_rows:
            noise.append(uni[off : off + r])
            off += r
        compute(st_ref[...], act_ref[...], noise, st_out, obs_out, aux_out)

    def pspec(rows):
        return pl.BlockSpec((rows, 8, tl), lambda i, s: (0, 0, i))

    call = pl.pallas_call(
        kernel_rng,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pspec(S), pspec(n_act)],
            out_specs=[pspec(S), pspec(obs_size), pspec(aux_rows)],
        ),
        out_shape=out_shape,
        interpret=interpret,
    )

    def step_rng(state, action, seed):
        return out3(*call(seed, r3(state), r3(action)))

    return step_rng


# ---------------------------------------------------------------------------
# SSLStaticDefenders-v0
# ---------------------------------------------------------------------------

def sd_state_size(n_robots: int) -> int:
    # ball 6 + robots 6N + steps 1 + shaping 8
    return 15 + 6 * n_robots


def pack_sd_state(state) -> jnp.ndarray:
    """Batched SDState (lane layout) -> (S, B)."""
    w = state.world
    rows = [
        w.ball.x[None], w.ball.y[None], w.ball.z[None],
        w.ball.v_x[None], w.ball.v_y[None], w.ball.v_z[None],
        w.robots.x, w.robots.y, w.robots.theta,
        w.robots.v_x, w.robots.v_y, w.robots.v_theta,
        state.steps[None].astype(jnp.float32),
        state.shaping,
    ]
    return jnp.concatenate(rows, axis=0)


def unpack_sd_state(arr: jnp.ndarray, env):
    """(S, B) -> batched SDState (see :func:`_unpack_world`)."""
    from rsoccer_tpu.envs.ssl_static_defenders import SDState

    world, steps, shaping = _unpack_world(arr, env, n_extra=8)
    return SDState(world=world, steps=steps, shaping=shaping)


def make_pallas_sd_full_step(
    env,
    batch: int,
    tile: int = 2048,
    interpret: bool | None = None,
    rng: str = "input",
    emit_final_obs: bool = False,
):
    """Full-step kernel for SSLStaticDefenders-v0.

    ``rng="input"``: ``step(state (S,B), action (5,B), ball_u (2K,B),
    spawn_u (N_y*2K,B), theta_u (N_y,B)) -> (state, obs (24,B), aux (11,B))``
    with aux rows [reward, term, trunc, shaping0..7].
    ``rng="kernel"``: ``step(state, action, seed (1,) int32) -> ...`` with
    all noise from the in-kernel hardware PRNG (TPU only).
    ``emit_final_obs=True``: obs output doubles to ``(48, B)`` — rows 24:
    the final (pre-reset) observation (see ops/pallas_vss_full.py).
    """
    if batch % tile or tile % 8:
        raise ValueError(f"bad batch/tile: {batch}/{tile}")
    if rng not in ("input", "kernel"):
        raise ValueError(f"rng must be 'input' or 'kernel', got {rng!r}")

    field = env.field
    cfg = env.physics_cfg
    n = env.n_robots  # 7
    n_y = env.n_yellow  # 6
    K = spawn_mod.N_CANDIDATES
    S = sd_state_size(n)
    obs_size = env.obs_size  # 24
    max_steps = float(env.max_episode_steps)

    max_v = env.max_v
    max_w_cmd = env.max_w_cmd
    max_w_norm = env.max_w_norm
    max_pos = env.max_pos
    nbnd = env.norm_bounds
    kick_speed = env.kick_speed_x
    ball_dist_scale = env.ball_dist_scale
    ball_grad_scale = env.ball_grad_scale
    energy_scale = env.energy_scale

    half_len, half_wid = field.half_length, field.half_width
    pen_len, half_pen_wid = field.penalty_length, field.penalty_width / 2
    half_goal_wid = field.goal_width / 2
    wheel_r = field.rbt_wheel_radius
    J = wheel_jacobian(field)  # (4,3) numpy constants

    physics = make_ssl_physics_body(field, cfg, env.time_step, cfg.n_substeps)

    def compute(st, act, noise, st_out, obs_out, aux_out):
        ball_u, sp_u, th_u = noise
        bx0, by0, bz0, bvx0, bvy0, bvz0 = (st[i] for i in range(6))
        o = 6
        x = st[o : o + n]; o += n
        y = st[o : o + n]; o += n
        theta = st[o : o + n]; o += n
        vx = st[o : o + n]; o += n
        vy = st[o : o + n]; o += n
        w = st[o : o + n]; o += n
        steps = st[o]; o += 1
        shaping = st[o : o + 8]

        # --- convert_actions (ssl_common.convert_actions; robot 0 only)
        a_vx = act[0] * max_v
        a_vy = act[1] * max_v
        a_vt = act[2] * max_w_cmd
        cos_all = jnp.cos(theta)
        sin_all = jnp.sin(theta)
        c0 = cos_all[0]
        s0 = sin_all[0]
        lvx = a_vx * c0 + a_vy * s0
        lvy = -a_vx * s0 + a_vy * c0
        v_norm = jnp.sqrt(lvx * lvx + lvy * lvy)
        sc = jnp.where(v_norm < max_v, 1.0, max_v / jnp.maximum(v_norm, _EPS))
        lvx = lvx * sc
        lvy = lvy * sc

        zero_n1 = jnp.zeros_like(x[1:])
        tu = jnp.concatenate([lvx[None], zero_n1], axis=0)
        tv = jnp.concatenate([lvy[None], zero_n1], axis=0)
        tw = jnp.concatenate([a_vt[None], zero_n1], axis=0)
        kick0 = jnp.where(act[3] > 0.0, kick_speed, 0.0)
        kick_vx = jnp.concatenate([kick0[None], zero_n1], axis=0)
        kick_vz = jnp.zeros_like(kick_vx)
        dribbler = jnp.concatenate(
            [(act[4] > 0.0)[None], zero_n1 > 1.0], axis=0
        )

        x2, y2, theta2, vx2, vy2, w2, ball2, infrared, trig2 = physics(
            x, y, theta, vx, vy, w,
            (bx0, by0, bz0, bvx0, bvy0, bvz0),
            (tu, tv, tw), kick_vx, kick_vz, dribbler,
            trig0=(cos_all, sin_all), n_active=1,
        )
        bx, by, bz, bvx, bvy, bvz = ball2

        # --- termination priority chain + reward (envs/ssl_static_defenders)
        rx, ry = x2[0], y2[0]
        c_rbt_out = (rx < -0.2) | (jnp.abs(ry) > half_wid)
        c_gk = (
            ~c_rbt_out & (rx > half_len - pen_len) & (jnp.abs(ry) < half_pen_wid)
        )
        c_ball_out = ~c_rbt_out & ~c_gk & ((bx < 0) | (jnp.abs(by) > half_wid))
        c_ball_right = ~c_rbt_out & ~c_gk & ~c_ball_out & (bx > half_len)
        goal = c_ball_right & (jnp.abs(by) < half_goal_wid)
        ball_out_right = c_ball_right & ~goal
        term = c_rbt_out | c_gk | c_ball_out | c_ball_right
        sb = ~term

        # shaping terms (ssl_common helpers)
        last_d = jnp.sqrt((x[0] - bx0) ** 2 + (y[0] - by0) ** 2)
        d = jnp.sqrt((rx - bx) ** 2 + (ry - by) ** 2)
        ball_dist = jnp.clip(last_d - d, -1.0, 1.0) / ball_dist_scale
        last_g = jnp.sqrt((bx0 - half_len) ** 2 + by0 * by0)
        g = jnp.sqrt((bx - half_len) ** 2 + by * by)
        ball_grad = jnp.clip(last_g - g, -1.0, 1.0) / ball_grad_scale
        # energy: sum |achieved wheel speed| of robot 0 (post-step frame);
        # heading trig reused from the physics body's carried rotation
        cos_p = trig2[0][0]
        sin_p = trig2[1][0]
        u0 = vx2[0] * cos_p + vy2[0] * sin_p
        s0p = -vx2[0] * sin_p + vy2[0] * cos_p
        e = 0.0
        for k in range(4):
            e = e + jnp.abs(
                (float(J[k, 0]) * u0 + float(J[k, 1]) * s0p + float(J[k, 2]) * w2[0])
                / wheel_r
            )
        energy = -e / energy_scale
        shaped = ball_dist + ball_grad + energy
        reward = jnp.where(goal, 5.0, jnp.where(sb, shaped, 0.0))

        zero = jnp.zeros_like(reward)
        shaping_new = shaping + jnp.stack([
            jnp.where(goal, 1.0, 0.0),
            jnp.where(c_gk, 1.0, 0.0),
            jnp.where(c_ball_out, 1.0, 0.0),
            jnp.where(ball_out_right, 1.0, 0.0),
            jnp.where(c_rbt_out, 1.0, 0.0),
            jnp.where(sb, ball_dist, zero),
            jnp.where(sb, ball_grad, zero),
            jnp.where(sb, energy, zero),
        ])

        steps_new = steps + 1.0
        trunc = steps_new >= max_steps
        done = term | trunc

        # --- reset spawn (envs/ssl_static_defenders.reset_state)
        bx_c = 0.2 + ball_u[:K] * (half_len - 0.1 - 0.2)
        by_c = -half_wid + 0.1 + ball_u[K:] * (2 * half_wid - 0.2)
        in_gk = (bx_c > half_len - pen_len) & (jnp.abs(by_c) < half_pen_wid)
        # pick_first(~in_gk) one-hot
        ok = ~in_gk
        seen = jnp.zeros_like(ok[0])
        any_ok = jnp.zeros_like(ok[0])
        rbx = jnp.zeros_like(bx_c[0])
        rby = jnp.zeros_like(by_c[0])
        for k in range(K):
            first_k = ok[k] & ~seen
            seen = seen | ok[k]
            any_ok = any_ok | ok[k]
            rbx = jnp.where(first_k, bx_c[k], rbx)
            rby = jnp.where(first_k, by_c[k], rby)
        rbx = jnp.where(any_ok, rbx, bx_c[0])
        rby = jnp.where(any_ok, rby, by_c[0])

        placed = [(rbx, rby), (jnp.zeros_like(rbx), jnp.zeros_like(rby))]
        yxs, yys = [], []
        for i in range(n_y):
            base = i * 2 * K
            cx = 0.2 + sp_u[base : base + K] * (half_len - 0.1 - 0.2)
            cy = (
                -half_wid + 0.1
                + sp_u[base + K : base + 2 * K] * (2 * half_wid - 0.2)
            )
            sx_i, sy_i = _first_valid(cx, cy, placed, 0.2 * 0.2)
            placed.append((sx_i, sy_i))
            yxs.append(sx_i)
            yys.append(sy_i)

        reset_theta = th_u * (2.0 * jnp.pi)  # (n_y, T)
        z1 = jnp.zeros_like(rbx)

        # pre-reset values for the final-obs build (overwritten by sel)
        bxf, byf, bvxf, bvyf = bx, by, bvx, bvy

        # --- auto-reset select
        def sel(r, v):
            return jnp.where(done, r, v)

        bx = sel(rbx, bx)
        by = sel(rby, by)
        bz = sel(jnp.full_like(bz, field.ball_radius), bz)
        bvx = sel(zero, bvx)
        bvy = sel(zero, bvy)
        bvz = sel(zero, bvz)
        reset_x = jnp.concatenate([z1[None], jnp.stack(yxs)], axis=0)
        reset_y = jnp.concatenate([z1[None], jnp.stack(yys)], axis=0)
        reset_t = jnp.concatenate([z1[None], reset_theta], axis=0)
        x_out = jnp.where(done[None], reset_x, x2)
        y_out = jnp.where(done[None], reset_y, y2)
        t_out = jnp.where(done[None], reset_t, theta2)
        vx_out = jnp.where(done[None], 0.0, vx2)
        vy_out = jnp.where(done[None], 0.0, vy2)
        w_out = jnp.where(done[None], 0.0, w2)
        # reset lanes drop infrared; boolean AND instead of select_n —
        # Mosaic rejects i1 selects ("unsupported target bitwidth")
        ir_out = infrared & ~done[None]
        steps_out = jnp.where(done, 0.0, steps_new)
        shaping_out = jnp.where(done[None], 0.0, shaping_new)

        # --- observation (ssl_common.observe_standard, infrared_low=0)
        def npos(v):
            return jnp.clip(v / max_pos, -nbnd, nbnd)

        def nv(v):
            return jnp.clip(v / max_v, -nbnd, nbnd)

        def nw(v):
            return jnp.clip(v / max_w_norm, -nbnd, nbnd)

        obs_rows = [npos(bx), npos(by), nv(bvx), nv(bvy)]
        obs_rows += [
            npos(x_out[0]), npos(y_out[0]),
            # robot 0 resets to theta=0 (sin 0, cos 1): select on the
            # physics trig instead of re-lowering sin/cos of t_out[0]
            jnp.where(done, 0.0, trig2[1][0]),
            jnp.where(done, 1.0, trig2[0][0]),
            nv(vx_out[0]), nv(vy_out[0]), nw(w_out[0]),
            jnp.where(ir_out[0], 1.0, 0.0),
        ]
        for i in range(1, n):
            obs_rows += [npos(x_out[i]), npos(y_out[i])]

        if emit_final_obs:
            # final (pre-reset) observation from the post-physics state
            obs_rows += [npos(bxf), npos(byf), nv(bvxf), nv(bvyf)]
            obs_rows += [
                npos(x2[0]), npos(y2[0]),
                trig2[1][0], trig2[0][0],
                nv(vx2[0]), nv(vy2[0]), nw(w2[0]),
                jnp.where(infrared[0], 1.0, 0.0),
            ]
            for i in range(1, n):
                obs_rows += [npos(x2[i]), npos(y2[i])]

        st_out[...] = jnp.concatenate(
            [
                jnp.stack([bx, by, bz, bvx, bvy, bvz]),
                x_out, y_out, t_out, vx_out, vy_out, w_out,
                steps_out[None],
                shaping_out,
            ],
            axis=0,
        )
        obs_out[...] = jnp.stack(obs_rows)
        aux_out[...] = jnp.concatenate(
            [
                jnp.stack([
                    reward,
                    term.astype(jnp.float32),
                    trunc.astype(jnp.float32),
                ]),
                shaping_new,
            ],
            axis=0,
        )

    return _build_call(
        compute,
        S=S, n_act=5,
        obs_size=2 * obs_size if emit_final_obs else obs_size,
        aux_rows=11,
        noise_rows=[2 * K, n_y * 2 * K, n_y],
        batch=batch, tile=tile, interpret=interpret, rng=rng,
    )


# ---------------------------------------------------------------------------
# SSLContestedPossession-v0
# ---------------------------------------------------------------------------

def cp_state_size() -> int:
    # ball 6 + 2 robots x 6 + steps 1 + shaping 9
    return 28


def pack_cp_state(state) -> jnp.ndarray:
    w = state.world
    rows = [
        w.ball.x[None], w.ball.y[None], w.ball.z[None],
        w.ball.v_x[None], w.ball.v_y[None], w.ball.v_z[None],
        w.robots.x, w.robots.y, w.robots.theta,
        w.robots.v_x, w.robots.v_y, w.robots.v_theta,
        state.steps[None].astype(jnp.float32),
        state.shaping,
    ]
    return jnp.concatenate(rows, axis=0)


def unpack_cp_state(arr: jnp.ndarray, env):
    from rsoccer_tpu.envs.ssl_contested_possession import CPState

    world, steps, rest = _unpack_world(arr, env, n_extra=9)
    return CPState(world=world, steps=steps, shaping=rest)


def _unpack_world(arr, env, n_extra):
    """Shared ball/robots/steps unpack; returns (world, steps, extra_rows).

    infrared is recomputed from the kicker-contact predicate and achieved
    wheel speeds via the forward jacobian, both as physics/ssl.py — the
    kernel state stores neither (the obs the kernel built already consumed
    them)."""
    n = env.n_robots
    o = 6
    x = arr[o : o + n]; o += n
    y = arr[o : o + n]; o += n
    theta = arr[o : o + n]; o += n
    vx = arr[o : o + n]; o += n
    vy = arr[o : o + n]; o += n
    vth = arr[o : o + n]; o += n
    steps = arr[o].astype(jnp.int32); o += 1
    extra = arr[o : o + n_extra]

    J = wheel_jacobian(env.field)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    u = vx * cos_t + vy * sin_t
    s = -vx * sin_t + vy * cos_t
    local = jnp.stack([u, s, vth], axis=1)
    v_wheel = (
        jnp.einsum("wk,nkb->nwb", jnp.asarray(J), local)
        / env.field.rbt_wheel_radius
    )

    from rsoccer_tpu.physics.config import SSL_PHYSICS

    f = env.field
    dx = arr[0][None] - x
    dy = arr[1][None] - y
    lx = dx * cos_t + dy * sin_t
    ly = -dx * sin_t + dy * cos_t
    lo = f.rbt_distance_center_kicker - f.rbt_kicker_thickness - f.ball_radius
    hi = (
        f.rbt_distance_center_kicker
        + f.ball_radius
        + SSL_PHYSICS.kicker_depth_slack
    )
    low = (arr[2][None] - f.ball_radius) <= SSL_PHYSICS.kicker_height
    infrared = (
        (lx >= lo) & (lx <= hi) & (jnp.abs(ly) <= f.rbt_kicker_width / 2) & low
    )

    world = WorldState(
        ball=BallState(
            x=arr[0], y=arr[1], z=arr[2], v_x=arr[3], v_y=arr[4], v_z=arr[5]
        ),
        robots=RobotsState(
            x=x, y=y, theta=theta, v_x=vx, v_y=vy, v_theta=vth,
            infrared=infrared, v_wheel=v_wheel,
        ),
    )
    return world, steps, extra


def make_pallas_cp_full_step(
    env, batch: int, tile: int = 2048, interpret: bool | None = None,
    rng: str = "input", emit_final_obs: bool = False,
):
    """Full-step kernel for SSLContestedPossession-v0
    (envs/ssl_contested_possession.py semantics).  ``emit_final_obs=True``
    doubles the obs output with the pre-reset observation (see
    ops/pallas_vss_full.py)."""
    field = env.field
    cfg = env.physics_cfg
    n = env.n_robots  # 2
    S = cp_state_size()
    obs_size = env.obs_size  # 14
    max_steps = float(env.max_episode_steps)

    max_v, max_w_cmd = env.max_v, env.max_w_cmd
    max_w_norm, max_pos, nbnd = env.max_w_norm, env.max_pos, env.norm_bounds
    kick_speed = env.kick_speed_x
    ball_dist_scale = env.ball_dist_scale
    ball_grad_scale = env.ball_grad_scale
    energy_scale = env.energy_scale

    half_len, half_wid = field.half_length, field.half_width
    pen_len, half_pen_wid = field.penalty_length, field.penalty_width / 2
    half_goal_wid = field.goal_width / 2
    wheel_r = field.rbt_wheel_radius
    J = wheel_jacobian(field)
    physics = make_ssl_physics_body(field, cfg, env.time_step, cfg.n_substeps)

    def compute(st, act, noise, st_out, obs_out, aux_out):
        (enemy_u,) = noise
        bx0, by0, bz0, bvx0, bvy0, bvz0 = (st[i] for i in range(6))
        o = 6
        x = st[o : o + n]; o += n
        y = st[o : o + n]; o += n
        theta = st[o : o + n]; o += n
        vx = st[o : o + n]; o += n
        vy = st[o : o + n]; o += n
        w = st[o : o + n]; o += n
        steps = st[o]; o += 1
        shaping = st[o : o + 9]

        # convert_actions (robot 0)
        a_vx = act[0] * max_v
        a_vy = act[1] * max_v
        a_vt = act[2] * max_w_cmd
        cos_all = jnp.cos(theta)
        sin_all = jnp.sin(theta)
        c0 = cos_all[0]
        s0 = sin_all[0]
        lvx = a_vx * c0 + a_vy * s0
        lvy = -a_vx * s0 + a_vy * c0
        v_norm = jnp.sqrt(lvx * lvx + lvy * lvy)
        sc = jnp.where(v_norm < max_v, 1.0, max_v / jnp.maximum(v_norm, _EPS))
        lvx = lvx * sc
        lvy = lvy * sc

        zero_n1 = jnp.zeros_like(x[1:])
        tu = jnp.concatenate([lvx[None], zero_n1], axis=0)
        tv = jnp.concatenate([lvy[None], zero_n1], axis=0)
        tw = jnp.concatenate([a_vt[None], zero_n1], axis=0)
        kick0 = jnp.where(act[3] > 0.0, kick_speed, 0.0)
        kick_vx = jnp.concatenate([kick0[None], zero_n1], axis=0)
        kick_vz = jnp.zeros_like(kick_vx)
        dribbler = jnp.concatenate(
            [(act[4] > 0.0)[None], zero_n1 > 1.0], axis=0
        )

        x2, y2, theta2, vx2, vy2, w2, ball2, infrared, trig2 = physics(
            x, y, theta, vx, vy, w,
            (bx0, by0, bz0, bvx0, bvy0, bvz0),
            (tu, tv, tw), kick_vx, kick_vz, dribbler,
            trig0=(cos_all, sin_all), n_active=1,
        )
        bx, by, bz, bvx, bvy, bvz = ball2

        # collision is independent of the chain (reference :165-169)
        collision = (jnp.abs(vx2[1]) > 0.1) | (jnp.abs(vy2[1]) > 0.1)

        rx, ry = x2[0], y2[0]
        c_rbt_out = (rx < -0.2) | (jnp.abs(ry) > half_wid)
        c_gk = (
            ~c_rbt_out
            & (rx > half_len - pen_len)
            & (jnp.abs(ry) < half_pen_wid)
        )
        c_ball_out = ~c_rbt_out & ~c_gk & ((bx < 0) | (jnp.abs(by) > half_wid))
        c_ball_right = ~c_rbt_out & ~c_gk & ~c_ball_out & (bx > half_len)
        goal = c_ball_right & (jnp.abs(by) < half_goal_wid)
        ball_out_right = c_ball_right & ~goal
        chain_done = c_rbt_out | c_gk | c_ball_out | c_ball_right
        sb = ~chain_done  # shaping still pays on collision steps
        term = collision | chain_done

        last_d = jnp.sqrt((x[0] - bx0) ** 2 + (y[0] - by0) ** 2)
        d = jnp.sqrt((rx - bx) ** 2 + (ry - by) ** 2)
        ball_dist = jnp.clip(last_d - d, -1.0, 1.0) / ball_dist_scale
        last_g = jnp.sqrt((bx0 - half_len) ** 2 + by0 * by0)
        g = jnp.sqrt((bx - half_len) ** 2 + by * by)
        ball_grad = jnp.clip(last_g - g, -1.0, 1.0) / ball_grad_scale
        cos_p = trig2[0][0]
        sin_p = trig2[1][0]
        u0 = vx2[0] * cos_p + vy2[0] * sin_p
        s0p = -vx2[0] * sin_p + vy2[0] * cos_p
        e = 0.0
        for k in range(4):
            e = e + jnp.abs(
                (
                    float(J[k, 0]) * u0
                    + float(J[k, 1]) * s0p
                    + float(J[k, 2]) * w2[0]
                )
                / wheel_r
            )
        energy = -e / energy_scale
        shaped = ball_dist + ball_grad + energy
        reward = jnp.where(goal, 5.0, jnp.where(sb, shaped, 0.0))

        zero = jnp.zeros_like(reward)
        shaping_new = shaping + jnp.stack([
            jnp.where(goal, 1.0, 0.0),
            jnp.where(c_gk, 1.0, 0.0),
            jnp.where(c_ball_out, 1.0, 0.0),
            jnp.where(ball_out_right, 1.0, 0.0),
            jnp.where(c_rbt_out, 1.0, 0.0),
            jnp.where(sb, ball_dist, zero),
            jnp.where(sb, ball_grad, zero),
            jnp.where(sb, energy, zero),
            jnp.where(collision, 1.0, 0.0),
        ])

        steps_new = steps + 1.0
        trunc = steps_new >= max_steps
        done = term | trunc

        # reset (envs/ssl_contested_possession.reset_state)
        enemy_x = pen_len + enemy_u[0] * (half_len - 2 * pen_len)
        enemy_y = -half_pen_wid + enemy_u[1] * (2 * half_pen_wid)

        # pre-reset values for the final-obs build (overwritten by sel)
        bxf, byf, bvxf, bvyf = bx, by, bvx, bvy

        def sel(r, v):
            return jnp.where(done, r, v)

        bx = sel(enemy_x - 0.1, bx)
        by = sel(enemy_y, by)
        bz = sel(jnp.full_like(bz, field.ball_radius), bz)
        bvx = sel(zero, bvx)
        bvy = sel(zero, bvy)
        bvz = sel(zero, bvz)
        z1 = jnp.zeros_like(enemy_x)
        reset_x = jnp.stack([z1, enemy_x])
        reset_y = jnp.stack([z1, enemy_y])
        reset_t = jnp.stack([z1, jnp.full_like(enemy_x, jnp.pi)])
        x_out = jnp.where(done[None], reset_x, x2)
        y_out = jnp.where(done[None], reset_y, y2)
        t_out = jnp.where(done[None], reset_t, theta2)
        vx_out = jnp.where(done[None], 0.0, vx2)
        vy_out = jnp.where(done[None], 0.0, vy2)
        w_out = jnp.where(done[None], 0.0, w2)
        ir_out = infrared & ~done[None]
        steps_out = jnp.where(done, 0.0, steps_new)
        shaping_out = jnp.where(done[None], 0.0, shaping_new)

        def npos(v):
            return jnp.clip(v / max_pos, -nbnd, nbnd)

        def nv(v):
            return jnp.clip(v / max_v, -nbnd, nbnd)

        def nw(v):
            return jnp.clip(v / max_w_norm, -nbnd, nbnd)

        obs_rows = [npos(bx), npos(by), nv(bvx), nv(bvy)]
        obs_rows += [
            npos(x_out[0]), npos(y_out[0]),
            # robot 0 resets to theta=0: select on the physics trig
            jnp.where(done, 0.0, trig2[1][0]),
            jnp.where(done, 1.0, trig2[0][0]),
            nv(vx_out[0]), nv(vy_out[0]), nw(w_out[0]),
            jnp.where(ir_out[0], 1.0, 0.0),
        ]
        obs_rows += [npos(x_out[1]), npos(y_out[1])]

        if emit_final_obs:
            obs_rows += [npos(bxf), npos(byf), nv(bvxf), nv(bvyf)]
            obs_rows += [
                npos(x2[0]), npos(y2[0]),
                trig2[1][0], trig2[0][0],
                nv(vx2[0]), nv(vy2[0]), nw(w2[0]),
                jnp.where(infrared[0], 1.0, 0.0),
            ]
            obs_rows += [npos(x2[1]), npos(y2[1])]

        st_out[...] = jnp.concatenate(
            [
                jnp.stack([bx, by, bz, bvx, bvy, bvz]),
                x_out, y_out, t_out, vx_out, vy_out, w_out,
                steps_out[None],
                shaping_out,
            ],
            axis=0,
        )
        obs_out[...] = jnp.stack(obs_rows)
        aux_out[...] = jnp.concatenate(
            [
                jnp.stack([
                    reward,
                    term.astype(jnp.float32),
                    trunc.astype(jnp.float32),
                ]),
                shaping_new,
            ],
            axis=0,
        )

    return _build_call(
        compute,
        S=S, n_act=5,
        obs_size=2 * obs_size if emit_final_obs else obs_size,
        aux_rows=12,
        noise_rows=[2],
        batch=batch, tile=tile, interpret=interpret, rng=rng,
    )


# ---------------------------------------------------------------------------
# SSLDribbling-v0
# ---------------------------------------------------------------------------

_NODES = (-0.5, -1.0, -1.5, -2.0)  # envs/ssl_dribbling.NODES
_MARGIN = 1.0


def dr_state_size() -> int:
    # ball 6 + 5 robots x 6 + steps 1 + checkpoints 1
    return 38


def pack_dr_state(state) -> jnp.ndarray:
    w = state.world
    rows = [
        w.ball.x[None], w.ball.y[None], w.ball.z[None],
        w.ball.v_x[None], w.ball.v_y[None], w.ball.v_z[None],
        w.robots.x, w.robots.y, w.robots.theta,
        w.robots.v_x, w.robots.v_y, w.robots.v_theta,
        state.steps[None].astype(jnp.float32),
        state.checkpoints[None].astype(jnp.float32),
    ]
    return jnp.concatenate(rows, axis=0)


def unpack_dr_state(arr: jnp.ndarray, env):
    from rsoccer_tpu.envs.ssl_dribbling import DribblingState

    world, steps, rest = _unpack_world(arr, env, n_extra=1)
    return DribblingState(
        world=world, steps=steps, checkpoints=rest[0].astype(jnp.int32)
    )


def make_pallas_dr_full_step(
    env, batch: int, tile: int = 2048, interpret: bool | None = None,
    rng: str = "input", emit_final_obs: bool = False,
):
    """Full-step kernel for SSLDribbling-v0 (envs/ssl_dribbling.py
    semantics — gate automaton as f32 counter math; reset deterministic,
    so this task needs NO noise at all).  ``emit_final_obs=True`` doubles
    the obs output with the pre-reset observation (see
    ops/pallas_vss_full.py)."""
    field = env.field
    cfg = env.physics_cfg
    n = env.n_robots  # 5
    S = dr_state_size()
    obs_size = env.obs_size  # 21
    max_steps = float(env.max_episode_steps)

    max_v, max_w_cmd = env.max_v, env.max_w_cmd
    max_w_norm, max_pos, nbnd = env.max_w_norm, env.max_pos, env.norm_bounds
    physics = make_ssl_physics_body(field, cfg, env.time_step, cfg.n_substeps)
    n0, n1, n2, n3 = _NODES

    def compute(st, act, noise, st_out, obs_out, aux_out):
        del noise
        bx0, by0, bz0, bvx0, bvy0, bvz0 = (st[i] for i in range(6))
        o = 6
        x = st[o : o + n]; o += n
        y = st[o : o + n]; o += n
        theta = st[o : o + n]; o += n
        vx = st[o : o + n]; o += n
        vy = st[o : o + n]; o += n
        w = st[o : o + n]; o += n
        steps = st[o]; o += 1
        count = st[o]  # f32 checkpoint counter (exact small ints)

        # convert_actions (robot 0); action = [vx, vy, vtheta, dribbler]
        a_vx = act[0] * max_v
        a_vy = act[1] * max_v
        a_vt = act[2] * max_w_cmd
        cos_all = jnp.cos(theta)
        sin_all = jnp.sin(theta)
        c0 = cos_all[0]
        s0 = sin_all[0]
        lvx = a_vx * c0 + a_vy * s0
        lvy = -a_vx * s0 + a_vy * c0
        v_norm = jnp.sqrt(lvx * lvx + lvy * lvy)
        sc = jnp.where(v_norm < max_v, 1.0, max_v / jnp.maximum(v_norm, _EPS))
        lvx = lvx * sc
        lvy = lvy * sc

        zero_n1 = jnp.zeros_like(x[1:])
        tu = jnp.concatenate([lvx[None], zero_n1], axis=0)
        tv = jnp.concatenate([lvy[None], zero_n1], axis=0)
        tw = jnp.concatenate([a_vt[None], zero_n1], axis=0)
        kick_vx = jnp.zeros_like(tu)  # no kicker in this task
        kick_vz = jnp.zeros_like(tu)
        dribbler = jnp.concatenate(
            [(act[3] > 0.0)[None], zero_n1 > 1.0], axis=0
        )

        x2, y2, theta2, vx2, vy2, w2, ball2, infrared, trig2 = physics(
            x, y, theta, vx, vy, w,
            (bx0, by0, bz0, bvx0, bvy0, bvz0),
            (tu, tv, tw), kick_vx, kick_vz, dribbler,
            trig0=(cos_all, sin_all), n_active=1,
        )
        bx, by, bz, bvx, bvy, bvz = ball2

        # collision: any yellow moving (reference :143-145)
        collision = (
            jnp.sum(
                (
                    (jnp.abs(vx2[1:]) > 0.05) | (jnp.abs(vy2[1:]) > 0.05)
                ).astype(jnp.float32),
                axis=0,
            )
            > 0.0
        )

        rx, ry = x2[0], y2[0]
        rbt_out = (rx < n3 - _MARGIN) | (rx > _MARGIN) | (jnp.abs(ry) > _MARGIN)

        down = (by0 >= 0) & (by < 0)
        up = (by0 < 0) & (by >= 0)

        in01 = (bx < n0) & (bx > n1)
        in12 = (bx < n1) & (bx > n2)
        in23 = (bx < n2) & (bx > n3)
        in3m = (bx > n3 - _MARGIN) & (bx < n3)

        is_even = jnp.mod(count, 2.0) == 0.0
        even_ge2 = (count >= 2.0) & is_even
        odd_ge2 = (count >= 2.0) & ~is_even

        cross0 = (count == 0.0) & in01 & down
        cross1 = (count == 1.0) & in12 & up
        cross_even = even_ge2 & in23 & down
        reverse_even = even_ge2 & in23 & up
        cross_odd = odd_ge2 & in3m & up

        crossed = ~rbt_out & (cross0 | cross1 | cross_even | cross_odd)
        reversed_gate = ~rbt_out & reverse_even

        new_count = count + jnp.where(crossed, 1.0, 0.0)
        completed = ~rbt_out & cross_even & (new_count == 7.0)

        reward = jnp.where(crossed, 1.0, 0.0)
        term = collision | rbt_out | reversed_gate | completed

        steps_new = steps + 1.0
        trunc = steps_new >= max_steps
        done = term | trunc

        # deterministic reset (envs/ssl_dribbling.reset_state)
        zero = jnp.zeros_like(reward)

        # pre-reset values for the final-obs build (overwritten by sel)
        bxf, byf, bvxf, bvyf = bx, by, bvx, bvy

        def sel(rv, v):
            return jnp.where(done, rv, v)

        bx = sel(jnp.full_like(bx, -0.1), bx)
        by = sel(zero, by)
        bz = sel(jnp.full_like(bz, field.ball_radius), bz)
        bvx = sel(zero, bvx)
        bvy = sel(zero, bvy)
        bvz = sel(zero, bvz)
        reset_x = jnp.stack([
            zero,
            jnp.full_like(zero, n0), jnp.full_like(zero, n1),
            jnp.full_like(zero, n2), jnp.full_like(zero, n3),
        ])
        reset_y = jnp.zeros_like(reset_x)
        reset_t = jnp.full_like(reset_x, jnp.pi)
        x_out = jnp.where(done[None], reset_x, x2)
        y_out = jnp.where(done[None], reset_y, y2)
        t_out = jnp.where(done[None], reset_t, theta2)
        vx_out = jnp.where(done[None], 0.0, vx2)
        vy_out = jnp.where(done[None], 0.0, vy2)
        w_out = jnp.where(done[None], 0.0, w2)
        ir_out = infrared & ~done[None]
        steps_out = jnp.where(done, 0.0, steps_new)
        count_out = jnp.where(done, 0.0, new_count)

        def npos(v):
            return jnp.clip(v / max_pos, -nbnd, nbnd)

        def nv(v):
            return jnp.clip(v / max_v, -nbnd, nbnd)

        def nw(v):
            return jnp.clip(v / max_w_norm, -nbnd, nbnd)

        # obs head: checkpoint progress from the POST-select count
        head = (count_out / 6.0) * 2.0 - 1.0
        obs_rows = [head, npos(bx), npos(by), nv(bvx), nv(bvy)]
        obs_rows += [
            npos(x_out[0]), npos(y_out[0]),
            # robot 0 resets to theta=pi (sin 0, cos -1): select on the
            # physics trig.  sin(pi_f32) evaluated in f32 is ~-8.74e-8,
            # not 0 — bake the value the XLA path produces on reset lanes.
            jnp.where(done, float(np.sin(np.float32(np.pi))), trig2[1][0]),
            jnp.where(done, float(np.cos(np.float32(np.pi))), trig2[0][0]),
            nv(vx_out[0]), nv(vy_out[0]), nw(w_out[0]),
            jnp.where(ir_out[0], 1.0, -1.0),  # infrared in {-1, 1}!
        ]
        for i in range(1, n):
            obs_rows += [npos(x_out[i]), npos(y_out[i])]

        if emit_final_obs:
            # final obs head from the PRE-reset checkpoint count
            obs_rows += [
                (new_count / 6.0) * 2.0 - 1.0,
                npos(bxf), npos(byf), nv(bvxf), nv(bvyf),
            ]
            obs_rows += [
                npos(x2[0]), npos(y2[0]),
                trig2[1][0], trig2[0][0],
                nv(vx2[0]), nv(vy2[0]), nw(w2[0]),
                jnp.where(infrared[0], 1.0, -1.0),  # infrared in {-1, 1}!
            ]
            for i in range(1, n):
                obs_rows += [npos(x2[i]), npos(y2[i])]

        st_out[...] = jnp.concatenate(
            [
                jnp.stack([bx, by, bz, bvx, bvy, bvz]),
                x_out, y_out, t_out, vx_out, vy_out, w_out,
                steps_out[None],
                count_out[None],
            ],
            axis=0,
        )
        obs_out[...] = jnp.stack(obs_rows)
        aux_out[...] = jnp.stack(
            [reward, term.astype(jnp.float32), trunc.astype(jnp.float32)]
        )

    return _build_call(
        compute,
        S=S, n_act=4,
        obs_size=2 * obs_size if emit_final_obs else obs_size,
        aux_rows=3,
        noise_rows=[],
        batch=batch, tile=tile, interpret=interpret, rng=rng,
    )


# ---------------------------------------------------------------------------
# SSLPassEndurance-v0
# ---------------------------------------------------------------------------

def pe_state_size() -> int:
    # ball 6 + 2 robots x 6 + steps 1 + stopped_steps 1 + shaping 2
    return 22


def pack_pe_state(state) -> jnp.ndarray:
    w = state.world
    rows = [
        w.ball.x[None], w.ball.y[None], w.ball.z[None],
        w.ball.v_x[None], w.ball.v_y[None], w.ball.v_z[None],
        w.robots.x, w.robots.y, w.robots.theta,
        w.robots.v_x, w.robots.v_y, w.robots.v_theta,
        state.steps[None].astype(jnp.float32),
        state.stopped_steps[None].astype(jnp.float32),
        state.shaping,
    ]
    return jnp.concatenate(rows, axis=0)


def unpack_pe_state(arr: jnp.ndarray, env):
    from rsoccer_tpu.envs.ssl_pass_endurance import PEState

    world, steps, rest = _unpack_world(arr, env, n_extra=3)
    return PEState(
        world=world, steps=steps,
        stopped_steps=rest[0].astype(jnp.int32), shaping=rest[1:],
    )


def make_pallas_pe_full_step(
    env, batch: int, tile: int = 2048, interpret: bool | None = None,
    rng: str = "input", emit_final_obs: bool = False,
):
    """Full-step kernel for SSLPassEndurance-v0
    (envs/ssl_pass_endurance.py semantics — shooter rotates/kicks only,
    receiver frozen with dribbler on; int-centimeter bbox wrong-ball test
    done in f32 trunc space, exact for field-scale magnitudes).
    ``emit_final_obs=True`` doubles the obs output with the pre-reset
    observation (see ops/pallas_vss_full.py)."""
    from rsoccer_tpu.envs.ssl_pass_endurance import N_CAND

    field = env.field
    cfg = env.physics_cfg
    n = env.n_robots  # 2
    S = pe_state_size()
    obs_size = env.obs_size  # 16
    max_steps = float(env.max_episode_steps)

    max_v, max_w_cmd = env.max_v, env.max_w_cmd
    max_w_norm, max_pos, nbnd = env.max_w_norm, env.max_pos, env.norm_bounds
    max_kick_x = env.max_kick_x
    ball_grad_scale = env.ball_grad_scale
    physics = make_ssl_physics_body(field, cfg, env.time_step, cfg.n_substeps)

    def compute(st, act, noise, st_out, obs_out, aux_out):
        ball_u, recv_u = noise
        bx0, by0, bz0, bvx0, bvy0, bvz0 = (st[i] for i in range(6))
        o = 6
        x = st[o : o + n]; o += n
        y = st[o : o + n]; o += n
        theta = st[o : o + n]; o += n
        vx = st[o : o + n]; o += n
        vy = st[o : o + n]; o += n
        w = st[o : o + n]; o += n
        steps = st[o]; o += 1
        stopped_steps = st[o]; o += 1
        shaping = st[o : o + 2]

        # commands: shooter vtheta + kick (|a1| > 0.5 deadzone, signed) +
        # dribbler; receiver frozen, dribbler always on
        kick = jnp.where(jnp.abs(act[1]) > 0.5, act[1], 0.0)
        zero1 = jnp.zeros_like(x[1:])
        tu = jnp.zeros_like(x)
        tv = jnp.zeros_like(x)
        tw = jnp.concatenate([(act[0] * max_w_cmd)[None], zero1], axis=0)
        kick_vx = jnp.concatenate([(kick * max_kick_x)[None], zero1], axis=0)
        kick_vz = jnp.zeros_like(kick_vx)
        dribbler = jnp.concatenate(
            [(act[2] > 0.0)[None], jnp.ones_like(zero1) > 0.0], axis=0
        )

        x2, y2, theta2, vx2, vy2, w2, ball2, infrared, trig2 = physics(
            x, y, theta, vx, vy, w,
            (bx0, by0, bz0, bvx0, bvy0, bvz0),
            (tu, tv, tw), kick_vx, kick_vz, dribbler, n_active=1,
        )
        bx, by, bz, bvx, bvy, bvz = ball2

        sx, sy = x2[0], y2[0]
        rx, ry = x2[1], y2[1]
        received = infrared[1]

        last_d = jnp.sqrt((bx0 - rx) ** 2 + (by0 - ry) ** 2)
        d = jnp.sqrt((bx - rx) ** 2 + (by - ry) ** 2)
        ball_grad = jnp.clip(last_d - d, -1.0, 1.0) / ball_grad_scale

        # wrong-ball: integer-centimeter bbox (int32 cast truncates toward
        # zero like the reference's int(); Mosaic has no trunc lowering)
        cbx = (bx * 100.0).astype(jnp.int32)
        cby = (by * 100.0).astype(jnp.int32)
        csx = (sx * 100.0).astype(jnp.int32)
        csy = (sy * 100.0).astype(jnp.int32)
        crx = (rx * 100.0).astype(jnp.int32)
        cry = (ry * 100.0).astype(jnp.int32)
        inside = (
            (jnp.minimum(crx, csx) <= cbx)
            & (cbx <= jnp.maximum(crx, csx))
            & (jnp.minimum(cry, csy) <= cby)
            & (cby <= jnp.maximum(cry, csy))
        )
        stopped = jnp.abs(last_d - d) < 0.01
        stopped_new = jnp.where(stopped, stopped_steps + 1.0, 0.0)
        wrong = (stopped_new > 20.0) | ~inside

        reward = (
            jnp.where(received, 1.0, ball_grad) + jnp.where(wrong, -1.0, 0.0)
        )
        term = received | wrong

        dist_robs = jnp.sqrt((rx - sx) ** 2 + (ry - sy) ** 2)
        reversed_dist = (dist_robs - d) / jnp.maximum(dist_robs, 1e-8)
        ball_grad_acc = shaping[1] + jnp.where(received, 0.0, ball_grad)

        steps_new = steps + 1.0
        trunc = steps_new >= max_steps
        done = term | trunc

        # reversed_dist written on TERMINATED steps only (received|wrong),
        # not on TimeLimit truncation — envs/ssl_pass_endurance.py:175-184
        shaping_new = jnp.stack([
            jnp.where(term, reversed_dist, shaping[0]),
            ball_grad_acc,
        ])

        # reset (envs/ssl_pass_endurance.reset_state)
        rbx = -1.5 + ball_u[0] * 3.0
        rby = -1.5 + ball_u[1] * 3.0
        factor = jnp.where(rby >= 0.0, 1.0, -1.0)
        shooter_x = rbx
        shooter_y = rby + 0.115 * factor
        shooter_t = jnp.where(factor > 0.0, -jnp.pi / 2, jnp.pi / 2)
        cand = -1.5 + recv_u * 3.0  # (N_CAND, T)
        ok = jnp.abs(cand - rbx[None]) >= 1.0
        seen = jnp.zeros_like(ok[0])
        any_ok = jnp.zeros_like(ok[0])
        recv_x = jnp.zeros_like(rbx)
        for k in range(N_CAND):
            first_k = ok[k] & ~seen
            seen = seen | ok[k]
            any_ok = any_ok | ok[k]
            recv_x = jnp.where(first_k, cand[k], recv_x)
        recv_x = jnp.where(any_ok, recv_x, cand[0])
        recv_y = -rby
        recv_t = _atan2(recv_y - shooter_y, recv_x - shooter_x) + jnp.pi

        zero = jnp.zeros_like(reward)

        # pre-reset values for the final-obs build (overwritten by sel)
        bxf, byf, bvxf, bvyf = bx, by, bvx, bvy

        def sel(rv, v):
            return jnp.where(done, rv, v)

        bx = sel(rbx, bx)
        by = sel(rby, by)
        bz = sel(jnp.full_like(bz, field.ball_radius), bz)
        bvx = sel(zero, bvx)
        bvy = sel(zero, bvy)
        bvz = sel(zero, bvz)
        x_out = jnp.where(done[None], jnp.stack([shooter_x, recv_x]), x2)
        y_out = jnp.where(done[None], jnp.stack([shooter_y, recv_y]), y2)
        t_out = jnp.where(done[None], jnp.stack([shooter_t, recv_t]), theta2)
        vx_out = jnp.where(done[None], 0.0, vx2)
        vy_out = jnp.where(done[None], 0.0, vy2)
        w_out = jnp.where(done[None], 0.0, w2)
        ir_out = infrared & ~done[None]
        steps_out = jnp.where(done, 0.0, steps_new)
        stopped_out = jnp.where(done, 0.0, stopped_new)
        shaping_out = jnp.where(done[None], 0.0, shaping_new)

        def npos(v):
            return jnp.clip(v / max_pos, -nbnd, nbnd)

        def nv(v):
            return jnp.clip(v / max_v, -nbnd, nbnd)

        def nw(v):
            return jnp.clip(v / max_w_norm, -nbnd, nbnd)

        # reset-lane heading trig without re-lowering sin/cos:
        # shooter resets to -+pi/2 (f32-evaluated constants); receiver's
        # reset heading is atan2(dy,dx)+pi, whose trig is just the negated
        # unit vector shooter->receiver (exact, no atan2 needed)
        sin_hpi = float(np.sin(np.float32(np.pi) / np.float32(2)))
        cos_hpi = float(np.cos(np.float32(np.pi) / np.float32(2)))
        rst_sin0 = jnp.where(factor > 0.0, -sin_hpi, sin_hpi)
        rst_cos0 = jnp.full_like(rst_sin0, cos_hpi)
        rdx = recv_x - shooter_x
        rdy = recv_y - shooter_y
        inv_rr = jax.lax.rsqrt(jnp.maximum(rdx * rdx + rdy * rdy, 1e-16))
        rst_sin1 = -rdy * inv_rr
        rst_cos1 = -rdx * inv_rr
        obs_sin = [
            jnp.where(done, rst_sin0, trig2[1][0]),
            jnp.where(done, rst_sin1, trig2[1][1]),
        ]
        obs_cos = [
            jnp.where(done, rst_cos0, trig2[0][0]),
            jnp.where(done, rst_cos1, trig2[0][1]),
        ]
        obs_rows = [npos(bx), npos(by), nv(bvx), nv(bvy)]
        for i in range(n):
            obs_rows += [
                npos(x_out[i]), npos(y_out[i]),
                obs_sin[i], obs_cos[i],
                nw(w_out[i]),
                jnp.where(ir_out[i], 1.0, 0.0),
            ]

        if emit_final_obs:
            obs_rows += [npos(bxf), npos(byf), nv(bvxf), nv(bvyf)]
            for i in range(n):
                obs_rows += [
                    npos(x2[i]), npos(y2[i]),
                    trig2[1][i], trig2[0][i],
                    nw(w2[i]),
                    jnp.where(infrared[i], 1.0, 0.0),
                ]

        st_out[...] = jnp.concatenate(
            [
                jnp.stack([bx, by, bz, bvx, bvy, bvz]),
                x_out, y_out, t_out, vx_out, vy_out, w_out,
                steps_out[None],
                stopped_out[None],
                shaping_out,
            ],
            axis=0,
        )
        obs_out[...] = jnp.stack(obs_rows)
        aux_out[...] = jnp.concatenate(
            [
                jnp.stack([
                    reward,
                    term.astype(jnp.float32),
                    trunc.astype(jnp.float32),
                ]),
                shaping_new,
            ],
            axis=0,
        )

    return _build_call(
        compute,
        S=S, n_act=3,
        obs_size=2 * obs_size if emit_final_obs else obs_size,
        aux_rows=5,
        noise_rows=[2, N_CAND],
        batch=batch, tile=tile, interpret=interpret, rng=rng,
    )
