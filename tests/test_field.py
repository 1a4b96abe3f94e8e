"""Field tables and derived constants match the reference's formulas.

Reference derivations: vss/vss_gym_base.py:52-58, ssl/ssl_gym_base.py:53-59.
"""

import math

from rsoccer_tpu.core.field import ssl_field, vss_field


def test_vss_field_type0_geometry():
    f = vss_field(0)
    assert f.length == 1.5 and f.width == 1.3
    assert f.goal_width == 0.4 and f.goal_depth == 0.1
    assert f.penalty_length == 0.15 and f.penalty_width == 0.7


def test_vss_derived_constants():
    f = vss_field(0)
    # max_pos = max(width/2, length/2 + penalty_length)
    assert math.isclose(f.max_pos, 0.9)
    # max_v = (rpm/60) * 2pi * wheel_radius ~= 1.199 m/s
    assert math.isclose(f.max_v, (440 / 60) * 2 * math.pi * 0.026)
    assert 1.15 < f.max_v < 1.25
    # max_w (reference stores deg/s) = rad2deg(max_v / 0.04) ~= 1717 deg/s
    assert 1650 < math.degrees(f.max_v / 0.04) < 1780


def test_ssl_field_hw_challenge_is_div_b_sized():
    f = ssl_field(2)
    assert f.length == 9.0 and f.width == 6.0
    assert f.penalty_length == 1.0 and f.penalty_width == 2.0
    assert f.goal_width == 1.0
    assert math.isclose(f.max_pos, 5.5)


def test_ssl_wheel_speed_cap_matches_reference_energy_scale():
    # static_defenders.py:71 hard-codes wheel_max_rad_s = 160
    f = ssl_field(2)
    assert math.isclose(f.max_wheel_rad_s, 160.0, rel_tol=0.01)


def test_all_field_types_present():
    for t in (0, 1):
        vss_field(t)
    for t in (0, 1, 2):
        ssl_field(t)
