"""Pair-list robot-robot collision resolution shared by the full-step
kernels (ops/pallas_vss_full.py, ops/pallas_ssl_full.py).

One implementation of the contact physics both leagues use (equal-mass
discs: positional de-penetration split evenly, restitution impulse along
the center line), expressed over the n(n-1)/2 upper-triangle PAIR LIST
instead of the dense n x n matrix — for the 6-robot VSS world that is 15
pair rows vs 36 matrix entries, the single hottest block in the measured
kernel profile (docs/pallas_full_step_design.md, round-3 postscript).
Push/impulse are applied antisymmetrically (x_i += f, x_j -= f); identical
physics to the dense form up to floating-point summation order (within the
5e-5 kernel-vs-XLA equivalence tolerance), and cross-validated against the
independent C++ oracles through those paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def resolve_pair_collisions(x, y, vx, vy, r_rbt, restitution):
    """One collision pass over all robot pairs.

    Args are (n, ...) rows (any trailing batch dims); returns the updated
    ``(x, y, vx, vy)``.  No-op for n <= 1.
    """
    n = x.shape[0]
    if n <= 1:
        return x, y, vx, vy
    pair_ij = [(i, j) for i in range(n) for j in range(i + 1, n)]

    dx = jnp.stack([x[i] - x[j] for i, j in pair_ij])  # (P, ...)
    dy = jnp.stack([y[i] - y[j] for i, j in pair_ij])
    d2 = jnp.maximum(dx * dx + dy * dy, _EPS * _EPS)
    inv_d = jax.lax.rsqrt(d2)
    overlap = 2.0 * r_rbt - d2 * inv_d
    colliding = overlap > 0.0
    # fx*dx = push * unit-normal-x; push = overlap/2 per body
    fx = jnp.where(colliding, 0.5 * overlap, 0.0) * inv_d
    pnx = fx * dx
    pny = fx * dy
    rvx = jnp.stack([vx[i] - vx[j] for i, j in pair_ij])
    rvy = jnp.stack([vy[i] - vy[j] for i, j in pair_ij])
    vn = rvx * dx + rvy * dy  # (v_rel . n) * d
    g = jnp.where(
        colliding & (vn < 0.0),
        -(1.0 + restitution) * 0.5 * vn,
        0.0,
    ) * (inv_d * inv_d)  # one /d for the vn scale, one for the unit normal
    gx = g * dx
    gy = g * dy

    def scatter(base, rows_):
        out = []
        for r in range(n):
            acc = base[r]
            for p, (i, j) in enumerate(pair_ij):
                if i == r:
                    acc = acc + rows_[p]
                elif j == r:
                    acc = acc - rows_[p]
            out.append(acc)
        return jnp.stack(out)

    return (
        scatter(x, pnx),
        scatter(y, pny),
        scatter(vx, gx),
        scatter(vy, gy),
    )
