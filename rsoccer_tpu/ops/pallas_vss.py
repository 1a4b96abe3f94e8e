"""Experimental Pallas kernel: fused VSS physics step (all substeps, one
kernel launch).

The XLA path (physics/vss.py) compiles each control step into ~15 fusions
(3 per substep); this kernel runs the entire 5-substep integration in VMEM
with one launch per batch tile.  Math is the same spec as the XLA step —
equivalence is pinned by tests (interpret mode on CPU; see also the C++
oracle).  Batched lane layout: every array carries the env batch in the
trailing dimension.

Wired into the envs via ``BatchedEnv(pallas_physics=True)``
(batch/vecenv.py); ``make_pallas_vss_physics`` is also usable directly for
kernel benchmarking.  The full-step kernel (physics + task logic fused, no
per-step pack/unpack) lives in ``ops.pallas_vss_full``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rsoccer_tpu.core.field import FieldParams
from rsoccer_tpu.physics.config import PhysicsConfig
from rsoccer_tpu.physics.vss import HALF_AXLE

_EPS = 1e-8


def _wrap_angle(t):
    return jnp.mod(t + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def make_pallas_vss_physics(
    field: FieldParams,
    cfg: PhysicsConfig,
    dt: float,
    n_robots: int,
    batch: int,
    tile: int = 1024,
    interpret: bool | None = None,
):
    """Build ``step(robots (6,N,B), ball (6,B), commands (2,N,B)) ->
    (robots, ball)`` where robots rows are [x, y, theta, vx, vy, vtheta]
    and ball rows are [x, y, z, vx, vy, vz] (z = center height)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if batch % tile:
        raise ValueError(f"batch {batch} not divisible by tile {tile}")

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

    def kernel(rb_ref, ball_ref, cmd_ref, rb_out, ball_out):
        rb = rb_ref[...]  # (6, N, T)
        ball = ball_ref[...]  # (6, T)
        cmd = cmd_ref[...]  # (2, N, T)

        x, y, theta, vx, vy, w = (rb[i] for i in range(6))
        bx, by, bz, bvx, bvy, bvz = (ball[i] for i in range(6))

        wl = jnp.clip(cmd[0], -max_wheel, max_wheel)
        wr = jnp.clip(cmd[1], -max_wheel, max_wheel)
        v_tgt = wheel_r * (wl + wr) / 2.0
        w_tgt = wheel_r * (wr - wl) / (2.0 * HALF_AXLE)

        for _ in range(cfg.n_substeps):
            cos_t = jnp.cos(theta)
            sin_t = jnp.sin(theta)
            u = vx * cos_t + vy * sin_t
            s = -vx * sin_t + vy * cos_t
            u = u + jnp.clip(v_tgt - u, -a_lin, a_lin)
            s = s * lat_keep
            w = w + jnp.clip(w_tgt - w, -a_ang, a_ang)
            theta = _wrap_angle(theta + w * dts)
            cos_n = jnp.cos(theta)
            sin_n = jnp.sin(theta)
            vx = u * cos_n - s * sin_n
            vy = u * sin_n + s * cos_n
            x = x + vx * dts
            y = y + vy * dts

            # robot-robot collisions (N, N, T).  The identity mask comes
            # from 3-D broadcasted iotas: Mosaic cannot insert a minor dim
            # on i1 vectors (jnp.eye(...)[..., None] fails to compile).
            dx = x[:, None] - x[None, :]
            dy = y[:, None] - y[None, :]
            d2 = dx * dx + dy * dy
            nn_shape = d2.shape
            rows = jax.lax.broadcasted_iota(jnp.int32, nn_shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, nn_shape, 1)
            eye = rows == cols
            d = jnp.sqrt(jnp.where(eye, 1.0, jnp.maximum(d2, _EPS * _EPS)))
            overlap = jnp.where(eye, 0.0, 2.0 * r_rbt - d)
            colliding = overlap > 0.0
            nx = dx / jnp.maximum(d, _EPS)
            ny = dy / jnp.maximum(d, _EPS)
            push = jnp.where(colliding, 0.5 * overlap, 0.0)
            x = x + jnp.sum(push * nx, axis=1)
            y = y + jnp.sum(push * ny, axis=1)
            rvx = vx[:, None] - vx[None, :]
            rvy = vy[:, None] - vy[None, :]
            vn = rvx * nx + rvy * ny
            imp = jnp.where(
                colliding & (vn < 0.0),
                -(1.0 + cfg.rest_robot_robot) * 0.5 * vn,
                0.0,
            )
            vx = vx + jnp.sum(imp * nx, axis=1)
            vy = vy + jnp.sum(imp * ny, axis=1)

            # robot-wall clamp
            xl = half_len - r_rbt
            yl = half_wid - r_rbt
            vx = jnp.where((jnp.abs(x) > xl) & (vx * jnp.sign(x) > 0), 0.0, vx)
            vy = jnp.where((jnp.abs(y) > yl) & (vy * jnp.sign(y) > 0), 0.0, vy)
            x = jnp.clip(x, -xl, xl)
            y = jnp.clip(y, -yl, yl)

            # ball friction (grounded only) + vertical axis + integrate
            on_ground = bz <= r_ball + 1e-4
            speed = jnp.sqrt(bvx * bvx + bvy * bvy + _EPS * _EPS)
            scale = jnp.maximum(0.0, 1.0 - cfg.ball_friction_decel * dts / speed)
            bvx = jnp.where(on_ground, bvx * scale, bvx)
            bvy = jnp.where(on_ground, bvy * scale, bvy)
            bvz = bvz - cfg.gravity * dts
            bz = bz + bvz * dts
            hit_floor = bz < r_ball
            bvz = jnp.where(
                hit_floor & (bvz < 0.0), -cfg.rest_ball_ground * bvz, bvz
            )
            bvz = jnp.where(
                hit_floor & (bvz < cfg.ball_bounce_min_v), 0.0, bvz
            )
            bz = jnp.where(hit_floor, r_ball, bz)
            bx = bx + bvx * dts
            by = by + bvy * dts

            # ball-robot collisions (N, T) contributions; a ball above the
            # robot top plate flies over
            below_top = (bz - r_ball) < cfg.rbt_height
            bdx = bx[None] - x
            bdy = by[None] - y
            bd = jnp.sqrt(jnp.maximum(bdx * bdx + bdy * bdy, _EPS * _EPS))
            boverlap = (r_rbt + r_ball) - bd
            bcol = (boverlap > 0.0) & below_top[None]
            bnx = bdx / jnp.maximum(bd, _EPS)
            bny = bdy / jnp.maximum(bd, _EPS)
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

            # ball walls with goal pockets
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

        rb_out[...] = jnp.stack([x, y, theta, vx, vy, w])
        ball_out[...] = jnp.stack([bx, by, bz, bvx, bvy, bvz])

    n = n_robots
    grid = (batch // tile,)
    step = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, n, tile), lambda i: (0, 0, i)),
            pl.BlockSpec((6, tile), lambda i: (0, i)),
            pl.BlockSpec((2, n, tile), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((6, n, tile), lambda i: (0, 0, i)),
            pl.BlockSpec((6, tile), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, n, batch), jnp.float32),
            jax.ShapeDtypeStruct((6, batch), jnp.float32),
        ],
        interpret=interpret,
    )
    return step
