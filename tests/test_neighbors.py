"""Nearest-neighbour utility tests (reference Utils/kdtree_test.py parity)."""

import math

import numpy as np
import pytest

from rsoccer_tpu.utils.neighbors import KDTree


def test_single_point():
    t = KDTree()
    t.insert((0.0, 0.0))
    p, d = t.get_nearest((3.0, 4.0))
    assert p == (0.0, 0.0)
    assert d == pytest.approx(5.0)


def test_picks_nearest_of_many():
    t = KDTree()
    pts = [(0, 0), (1, 1), (-1, 2), (0.5, 0.5), (3, -2)]
    for p in pts:
        t.insert(p)
    p, d = t.get_nearest((0.6, 0.6))
    assert p == (0.5, 0.5)
    assert d == pytest.approx(math.hypot(0.1, 0.1))


def test_exact_match_distance_zero():
    t = KDTree()
    t.insert((2.0, -3.0))
    t.insert((1.0, 1.0))
    p, d = t.get_nearest((1.0, 1.0))
    assert p == (1.0, 1.0)
    assert d == 0.0


def test_empty_raises():
    with pytest.raises(ValueError):
        KDTree().get_nearest((0, 0))


def test_matches_bruteforce_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        pts = rng.uniform(-1, 1, size=(10, 2))
        t = KDTree()
        for p in pts:
            t.insert(p)
        q = rng.uniform(-1, 1, size=2)
        p, d = t.get_nearest(q)
        d_all = np.linalg.norm(pts - q, axis=1)
        assert d == pytest.approx(d_all.min())
