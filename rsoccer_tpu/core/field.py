"""Field geometry and robot parameter tables.

The reference obtains these 17 parameters from the C++ rSim engine at runtime
(``Field`` dataclass, reference Entities/Field.py:4-21, populated via
``simulator.get_field_params()`` at Simulators/rsim.py:49-50).  Here they are
static Python-level constants: every environment closes over them so XLA
constant-folds all derived quantities into the compiled step.

Field types (reference vss/README.md:4 and ssl/README.md:4):
  VSS: 0 = 3v3 competition field, 1 = 5v5 field.
  SSL: 0 = 6v6 (division B), 1 = 11v11 (division A),
       2 = 2021 hardware-challenge field (division-B sized).

Units: meters, degrees for wheel mount angles, RPM for motor limit — matching
the reference's ``Field`` contract so derived values (``max_pos``, ``max_v``,
``max_w`` — reference vss/vss_gym_base.py:52-58, ssl/ssl_gym_base.py:53-59)
come out identical.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class FieldParams:
    """Mirror of the reference's 17-float ``Field`` contract.

    Reference: Entities/Field.py:4-21.
    """

    length: float
    width: float
    penalty_length: float
    penalty_width: float
    goal_width: float
    goal_depth: float
    ball_radius: float
    rbt_distance_center_kicker: float
    rbt_kicker_thickness: float
    rbt_kicker_width: float
    rbt_wheel0_angle: float
    rbt_wheel1_angle: float
    rbt_wheel2_angle: float
    rbt_wheel3_angle: float
    rbt_radius: float
    rbt_wheel_radius: float
    rbt_motor_max_rpm: float

    # ---- derived quantities (identical formulas to the reference) ----

    @property
    def half_length(self) -> float:
        return self.length / 2

    @property
    def half_width(self) -> float:
        return self.width / 2

    @property
    def max_pos(self) -> float:
        """Reference vss_gym_base.py:52-54 / ssl_gym_base.py:53-55."""
        return max(self.width / 2, (self.length / 2) + self.penalty_length)

    @property
    def max_wheel_rad_s(self) -> float:
        return (self.rbt_motor_max_rpm / 60.0) * 2.0 * math.pi

    @property
    def max_v(self) -> float:
        """Reference vss_gym_base.py:55-56."""
        return self.max_wheel_rad_s * self.rbt_wheel_radius

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


# ---------------------------------------------------------------------------
# VSS (IEEE Very Small Size Soccer) — differential drive, walled field.
# Geometry per VSS rules; robot constants chosen so the reference's derived
# values hold:  max_v = (440/60)*2*pi*0.026 ~= 1.199 m/s and
# max_w = rad2deg(max_v / 0.04) ~= 1717 deg/s (vss_gym_base.py:55-58).
# ---------------------------------------------------------------------------

VSS_FIELDS = {
    0: FieldParams(  # 3v3 competition field
        length=1.5,
        width=1.3,
        penalty_length=0.15,
        penalty_width=0.7,
        goal_width=0.4,
        goal_depth=0.1,
        ball_radius=0.0215,
        rbt_distance_center_kicker=0.0,
        rbt_kicker_thickness=0.0,
        rbt_kicker_width=0.0,
        rbt_wheel0_angle=90.0,
        rbt_wheel1_angle=270.0,
        rbt_wheel2_angle=0.0,
        rbt_wheel3_angle=0.0,
        rbt_radius=0.0375,
        rbt_wheel_radius=0.026,
        rbt_motor_max_rpm=440.0,
    ),
    1: FieldParams(  # 5v5 field
        length=2.2,
        width=1.8,
        penalty_length=0.15,
        penalty_width=0.7,
        goal_width=0.4,
        goal_depth=0.1,
        ball_radius=0.0215,
        rbt_distance_center_kicker=0.0,
        rbt_kicker_thickness=0.0,
        rbt_kicker_width=0.0,
        rbt_wheel0_angle=90.0,
        rbt_wheel1_angle=270.0,
        rbt_wheel2_angle=0.0,
        rbt_wheel3_angle=0.0,
        rbt_radius=0.0375,
        rbt_wheel_radius=0.026,
        rbt_motor_max_rpm=440.0,
    ),
}

# ---------------------------------------------------------------------------
# SSL (RoboCup Small Size League) — 4-wheel omnidirectional, open field.
# Wheel mount angles follow the common SSL configuration (front pair at
# +-60 deg, rear pair at +-135 deg from heading).  Motor limit chosen so the
# wheel speed cap is 160 rad/s, the constant the reference hard-codes for
# its energy-penalty scale (ssl_hw_challenge/static_defenders.py:71,
# contested_possession.py:59).
# ---------------------------------------------------------------------------

_SSL_ROBOT = dict(
    ball_radius=0.0215,
    rbt_distance_center_kicker=0.081,
    rbt_kicker_thickness=0.005,
    rbt_kicker_width=0.08,
    rbt_wheel0_angle=60.0,
    rbt_wheel1_angle=135.0,
    rbt_wheel2_angle=225.0,
    rbt_wheel3_angle=300.0,
    rbt_radius=0.09,
    rbt_wheel_radius=0.027,
    rbt_motor_max_rpm=1528.0,  # -> (1528/60)*2*pi ~= 160 rad/s wheel cap
)

SSL_FIELDS = {
    0: FieldParams(  # division B, 6v6 (9 x 6 m)
        length=9.0,
        width=6.0,
        penalty_length=1.0,
        penalty_width=2.0,
        goal_width=1.0,
        goal_depth=0.18,
        **_SSL_ROBOT,
    ),
    1: FieldParams(  # division A, 11v11 (12 x 9 m)
        length=12.0,
        width=9.0,
        penalty_length=1.8,
        penalty_width=3.6,
        goal_width=1.8,
        goal_depth=0.18,
        **_SSL_ROBOT,
    ),
    2: FieldParams(  # 2021 hardware challenges (division-B sized field)
        length=9.0,
        width=6.0,
        penalty_length=1.0,
        penalty_width=2.0,
        goal_width=1.0,
        goal_depth=0.18,
        **_SSL_ROBOT,
    ),
}


def vss_field(field_type: int) -> FieldParams:
    return VSS_FIELDS[field_type]


def ssl_field(field_type: int) -> FieldParams:
    return SSL_FIELDS[field_type]
