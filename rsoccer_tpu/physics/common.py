"""Shared branch-free physics kernels: circle collisions and wall geometry.

These replace the collision handling the reference inherits from the C++
rSim/ODE engine (out-of-repo; bound at Simulators/rsim.py:2).  Everything is
written as masked vector arithmetic — no data-dependent control flow — so a
single XLA fusion covers the whole step and ``vmap`` over the env batch is
free.

Robots are modelled as discs of radius ``rbt_radius``; the ball as a disc of
``ball_radius``.  Collision response is a single projection + impulse pass per
substep (positions separated along the contact normal, normal velocity
reflected with restitution), which at VSS/SSL densities (<= 12 robots) is
accurate and cheap: the all-pairs tensor is tiny and the batch axis carries
the parallelism.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def resolve_robot_robot(x, y, v_x, v_y, radius: float, restitution: float):
    """All-pairs disc-disc collision among N robots (equal masses).

    Args are (N,) arrays; returns corrected (x, y, v_x, v_y).
    """
    # pairwise deltas: (N, N)
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    n = x.shape[0]
    eye = jnp.eye(n, dtype=bool)
    d = jnp.sqrt(jnp.where(eye, 1.0, jnp.maximum(d2, _EPS * _EPS)))
    overlap = jnp.where(eye, 0.0, 2.0 * radius - d)
    colliding = overlap > 0.0

    nx = dx / jnp.maximum(d, _EPS)
    ny = dy / jnp.maximum(d, _EPS)

    # positional separation: each robot moves half the overlap away from the
    # other, summed over all contacts.
    push = jnp.where(colliding, 0.5 * overlap, 0.0)
    x = x + jnp.sum(push * nx, axis=1)
    y = y + jnp.sum(push * ny, axis=1)

    # velocity impulse: reflect the closing component of relative velocity.
    rvx = v_x[:, None] - v_x[None, :]
    rvy = v_y[:, None] - v_y[None, :]
    vn = rvx * nx + rvy * ny  # negative when closing
    j = jnp.where(colliding & (vn < 0.0), -(1.0 + restitution) * 0.5 * vn, 0.0)
    v_x = v_x + jnp.sum(j * nx, axis=1)
    v_y = v_y + jnp.sum(j * ny, axis=1)
    return x, y, v_x, v_y


def resolve_ball_robots(
    bx, by, bvx, bvy, rx, ry, rvx, rvy, robot_radius: float, ball_radius: float, restitution: float,
    active=None,
):
    """Ball vs N robot discs.  Ball takes the full correction (mass ratio ~0);
    robots are unaffected.  Returns corrected ball (x, y, v_x, v_y).

    ``restitution``: scalar or per-robot ``(N,)`` (SSL passes an array so a
    dribbling robot's kicker face absorbs the ball, physics/ssl.py).
    ``active``: optional scalar bool — when False every contact is ignored
    (a chipped ball above ``rbt_height`` flies over the robots).
    """
    dx = bx - rx
    dy = by - ry
    d2 = dx * dx + dy * dy
    d = jnp.sqrt(jnp.maximum(d2, _EPS * _EPS))
    min_d = robot_radius + ball_radius
    overlap = min_d - d
    colliding = overlap > 0.0
    if active is not None:
        colliding = colliding & active

    nx = dx / jnp.maximum(d, _EPS)
    ny = dy / jnp.maximum(d, _EPS)

    bx = bx + jnp.sum(jnp.where(colliding, overlap, 0.0) * nx)
    by = by + jnp.sum(jnp.where(colliding, overlap, 0.0) * ny)

    rel_vx = bvx - rvx
    rel_vy = bvy - rvy
    vn = rel_vx * nx + rel_vy * ny
    j = jnp.where(colliding & (vn < 0.0), -(1.0 + restitution) * vn, 0.0)
    bvx = bvx + jnp.sum(j * nx)
    bvy = bvy + jnp.sum(j * ny)
    return bx, by, bvx, bvy


def reflect_ball_walls_vss(
    bx, by, bvx, bvy, half_len: float, half_wid: float, goal_half_wid: float, goal_depth: float, ball_radius: float, restitution: float
):
    """VSS walled field with goal pockets.

    The field box is [-half_len, half_len] x [-half_wid, half_wid]; the end
    walls open for |y| < goal_half_wid into pockets of depth ``goal_depth``.
    A ball with x beyond half_len is inside a pocket — the goal condition the
    VSS task checks (reference vss/env_vss/vss_gym.py:161-169).
    """
    r = ball_radius
    in_mouth = jnp.abs(by) < goal_half_wid

    # end walls: at +-half_len outside the mouth, at +-(half_len+goal_depth)
    # inside the pocket.
    x_wall = jnp.where(in_mouth, half_len + goal_depth, half_len) - r
    over_x = jnp.abs(bx) - x_wall
    hit_x = over_x > 0.0
    sx = jnp.sign(bx)
    bx = jnp.where(hit_x, sx * x_wall, bx)
    bvx = jnp.where(hit_x & (bvx * sx > 0.0), -restitution * bvx, bvx)

    # side walls: field side walls when inside the field, pocket side walls
    # (|y| = goal_half_wid) when past the end line.
    in_pocket = jnp.abs(bx) > half_len
    y_wall = jnp.where(in_pocket, goal_half_wid, half_wid) - r
    over_y = jnp.abs(by) - y_wall
    hit_y = over_y > 0.0
    sy = jnp.sign(by)
    by = jnp.where(hit_y, sy * y_wall, by)
    bvy = jnp.where(hit_y & (bvy * sy > 0.0), -restitution * bvy, bvy)
    return bx, by, bvx, bvy


def clamp_robots_walls_vss(
    x, y, v_x, v_y, half_len: float, half_wid: float, radius: float
):
    """Robots clamp dead against the VSS walls (no bounce, no goal entry).

    Keeping robots out of the goal pockets is a simplification of the
    reference engine (robots are wider than the ball and rarely fit usefully);
    it cannot affect the VSS goal condition, which reads only the ball.
    """
    xl = half_len - radius
    yl = half_wid - radius
    hit_x = jnp.abs(x) > xl
    hit_y = jnp.abs(y) > yl
    v_x = jnp.where(hit_x & (v_x * jnp.sign(x) > 0.0), 0.0, v_x)
    v_y = jnp.where(hit_y & (v_y * jnp.sign(y) > 0.0), 0.0, v_y)
    x = jnp.clip(x, -xl, xl)
    y = jnp.clip(y, -yl, yl)
    return x, y, v_x, v_y


def apply_ball_friction(bvx, bvy, decel: float, dt: float):
    """Constant-deceleration rolling friction toward rest.

    The epsilon sits INSIDE the sqrt: ``sqrt(0)`` has an infinite gradient
    and a resting ball would poison the calibration harness's backward pass
    with NaNs (forward value is unchanged).
    """
    speed = jnp.sqrt(bvx * bvx + bvy * bvy + _EPS * _EPS)
    scale = jnp.maximum(0.0, 1.0 - decel * dt / speed)
    return bvx * scale, bvy * scale


def step_ball_vertical(
    z,
    v_z,
    ball_radius: float,
    gravity: float,
    restitution: float,
    min_bounce_v: float,
    dt: float,
):
    """One vertical substep: gravity, floor bounce, bounce settling.

    ``z`` is the ball CENTER height (ODE sphere-on-plane convention; rest
    value = ``ball_radius``).  The floor bounce reflects the downward
    velocity with ``restitution`` (grSim-lineage BallBounce) and kills
    rebounds slower than ``min_bounce_v`` (BallBounceVel) so a resting ball
    stays exactly at rest — see docs/fidelity.md.

    Returns (z, v_z).  Branch-free; works on any shape.
    """
    v_z = v_z - gravity * dt
    z = z + v_z * dt
    hit = z < ball_radius
    v_z = jnp.where(hit & (v_z < 0.0), -restitution * v_z, v_z)
    v_z = jnp.where(hit & (v_z < min_bounce_v), 0.0, v_z)
    z = jnp.where(hit, ball_radius, z)
    return z, v_z


def ball_on_ground(z, ball_radius: float):
    """Ground-contact predicate for gating rolling friction.

    The vertical substep clamps a grounded ball to exactly ``ball_radius``,
    so a small absolute tolerance suffices.
    """
    return z <= ball_radius + 1e-4


def wrap_angle(theta):
    """Wrap to [-pi, pi)."""
    return jnp.mod(theta + jnp.pi, 2.0 * jnp.pi) - jnp.pi
