"""Spawn sampler property tests (replaces reference KD-tree rejection loop)."""

import jax
import jax.numpy as jnp
import numpy as np

from rsoccer_tpu.envs import spawn


def _min_pairwise(xs, ys):
    p = np.stack([np.asarray(xs), np.asarray(ys)], axis=-1)
    d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    return d.min()


def test_points_in_bounds_and_separated():
    for seed in range(20):
        xs, ys = spawn.sample_separated(
            jax.random.PRNGKey(seed),
            n_points=7,
            x_lo=-0.65, x_hi=0.65, y_lo=-0.55, y_hi=0.55,
            min_dist=0.1,
        )
        assert np.all(np.asarray(xs) >= -0.65) and np.all(np.asarray(xs) <= 0.65)
        assert np.all(np.asarray(ys) >= -0.55) and np.all(np.asarray(ys) <= 0.55)
        assert _min_pairwise(xs, ys) >= 0.1


def test_respects_preplaced_points():
    for seed in range(10):
        xs, ys = spawn.sample_separated(
            jax.random.PRNGKey(seed),
            n_points=6,
            x_lo=0.2, x_hi=4.4, y_lo=-2.9, y_hi=2.9,
            min_dist=0.2,
            preplaced_x=[0.0, 1.0],
            preplaced_y=[0.0, 1.0],
        )
        p = np.stack([np.asarray(xs), np.asarray(ys)], axis=-1)
        for q in [np.array([0.0, 0.0]), np.array([1.0, 1.0])]:
            assert np.linalg.norm(p - q, axis=-1).min() >= 0.2
        assert _min_pairwise(xs, ys) >= 0.2


def test_jittable():
    f = jax.jit(
        lambda k: spawn.sample_separated(
            k, n_points=7, x_lo=-0.65, x_hi=0.65, y_lo=-0.55, y_hi=0.55,
            min_dist=0.1,
        )
    )
    xs, ys = f(jax.random.PRNGKey(0))
    assert xs.shape == (7,)
    assert _min_pairwise(xs, ys) >= 0.1


def test_uniform_marginal_distribution():
    # with min_dist tiny the sampler must be ~uniform
    keys = jax.random.split(jax.random.PRNGKey(42), 200)
    all_x = []
    for k in keys:
        xs, _ = spawn.sample_separated(
            k, n_points=3, x_lo=0.0, x_hi=1.0, y_lo=0.0, y_hi=1.0,
            min_dist=1e-4,
        )
        all_x.append(np.asarray(xs))
    x = np.concatenate(all_x)
    assert abs(x.mean() - 0.5) < 0.03
    assert abs(np.quantile(x, 0.25) - 0.25) < 0.05
