"""ctypes binding to the native C++ physics oracle.

Builds ``csrc/vss_physics.cpp`` on demand (g++, cached in ``csrc/build``)
and exposes :func:`vss_step_native` with the same single-env semantics as the
JAX kernel — used by the cross-validation tests and available as a host-side
fallback.  See csrc/vss_physics.cpp for why this exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from rsoccer_tpu.core.field import FieldParams
from rsoccer_tpu.physics.config import PhysicsConfig

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "vss_physics.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "csrc", "build")
_LIB = os.path.join(_BUILD_DIR, "libvss_oracle.so")

_lib: Optional[ctypes.CDLL] = None


class _CField(ctypes.Structure):
    _fields_ = [
        ("half_length", ctypes.c_float),
        ("half_width", ctypes.c_float),
        ("goal_half_wid", ctypes.c_float),
        ("goal_depth", ctypes.c_float),
        ("ball_radius", ctypes.c_float),
        ("rbt_radius", ctypes.c_float),
        ("wheel_radius", ctypes.c_float),
        ("max_wheel_rad_s", ctypes.c_float),
    ]


class _CPhysics(ctypes.Structure):
    _fields_ = [
        ("n_substeps", ctypes.c_int),
        ("robot_accel", ctypes.c_float),
        ("robot_alpha", ctypes.c_float),
        ("lateral_decay", ctypes.c_float),
        ("ball_friction_decel", ctypes.c_float),
        ("rest_ball_wall", ctypes.c_float),
        ("rest_ball_robot", ctypes.c_float),
        ("rest_robot_robot", ctypes.c_float),
        ("gravity", ctypes.c_float),
        ("rest_ball_ground", ctypes.c_float),
        ("ball_bounce_min_v", ctypes.c_float),
        ("rbt_height", ctypes.c_float),
    ]


def _ensure_built() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
        )
    _lib = ctypes.CDLL(_LIB)
    _lib.vss_step.argtypes = [
        ctypes.POINTER(_CField),
        ctypes.POINTER(_CPhysics),
        ctypes.c_float,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    _lib.vss_step.restype = None
    return _lib


def vss_step_native(
    field: FieldParams,
    cfg: PhysicsConfig,
    dt: float,
    ball: np.ndarray,  # (6,) x, y, z, vx, vy, vz — modified in place
    robots: np.ndarray,  # (N, 6) x, y, theta, vx, vy, vtheta — in place
    commands: np.ndarray,  # (N, 2) wheel rad/s
) -> np.ndarray:
    """Steps the world in place; returns achieved (N, 2) wheel speeds."""
    lib = _ensure_built()
    n = robots.shape[0]
    cf = _CField(
        half_length=field.half_length,
        half_width=field.half_width,
        goal_half_wid=field.goal_width / 2,
        goal_depth=field.goal_depth,
        ball_radius=field.ball_radius,
        rbt_radius=field.rbt_radius,
        wheel_radius=field.rbt_wheel_radius,
        max_wheel_rad_s=field.max_wheel_rad_s,
    )
    cp = _CPhysics(
        n_substeps=cfg.n_substeps,
        robot_accel=cfg.robot_accel,
        robot_alpha=cfg.robot_alpha,
        lateral_decay=cfg.lateral_decay,
        ball_friction_decel=cfg.ball_friction_decel,
        rest_ball_wall=cfg.rest_ball_wall,
        rest_ball_robot=cfg.rest_ball_robot,
        rest_robot_robot=cfg.rest_robot_robot,
        gravity=cfg.gravity,
        rest_ball_ground=cfg.rest_ball_ground,
        ball_bounce_min_v=cfg.ball_bounce_min_v,
        rbt_height=cfg.rbt_height,
    )
    ball_c = np.ascontiguousarray(ball, np.float32)
    robots_c = np.ascontiguousarray(robots, np.float32)
    cmds_c = np.ascontiguousarray(commands, np.float32)
    out_wheels = np.zeros((n, 2), np.float32)
    lib.vss_step(
        ctypes.byref(cf), ctypes.byref(cp), ctypes.c_float(dt), n,
        ball_c.reshape(-1), robots_c.reshape(-1), cmds_c.reshape(-1),
        out_wheels.reshape(-1),
    )
    ball[:] = ball_c
    robots[:] = robots_c
    return out_wheels


# ---------------------------------------------------------------------------
# SSL oracle (csrc/ssl_physics.cpp)
# ---------------------------------------------------------------------------

_SSL_SRC = os.path.join(_REPO_ROOT, "csrc", "ssl_physics.cpp")
_SSL_LIB = os.path.join(_BUILD_DIR, "libssl_oracle.so")

_ssl_lib: Optional[ctypes.CDLL] = None


class _CSSLField(ctypes.Structure):
    _fields_ = [
        ("ball_radius", ctypes.c_float),
        ("rbt_radius", ctypes.c_float),
        ("wheel_radius", ctypes.c_float),
        ("max_wheel_rad_s", ctypes.c_float),
        ("wheel_angle_deg", ctypes.c_float * 4),
        ("rbt_distance_center_kicker", ctypes.c_float),
        ("rbt_kicker_thickness", ctypes.c_float),
        ("rbt_kicker_width", ctypes.c_float),
    ]


class _CSSLPhysics(ctypes.Structure):
    _fields_ = [
        ("n_substeps", ctypes.c_int),
        ("robot_accel", ctypes.c_float),
        ("robot_alpha", ctypes.c_float),
        ("ball_friction_decel", ctypes.c_float),
        ("rest_ball_robot", ctypes.c_float),
        ("rest_dribbler", ctypes.c_float),
        ("rest_robot_robot", ctypes.c_float),
        ("gravity", ctypes.c_float),
        ("rest_ball_ground", ctypes.c_float),
        ("ball_bounce_min_v", ctypes.c_float),
        ("rbt_height", ctypes.c_float),
        ("kicker_height", ctypes.c_float),
        ("kicker_depth_slack", ctypes.c_float),
        ("dribbler_pull_accel", ctypes.c_float),
        ("dribbler_damping", ctypes.c_float),
        ("dribbler_capture_speed", ctypes.c_float),
        ("dribbler_reach", ctypes.c_float),
    ]


def _ensure_ssl_built() -> ctypes.CDLL:
    global _ssl_lib
    if _ssl_lib is not None:
        return _ssl_lib
    if not os.path.exists(_SSL_LIB) or os.path.getmtime(
        _SSL_LIB
    ) < os.path.getmtime(_SSL_SRC):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SSL_LIB, _SSL_SRC],
            check=True,
        )
    _ssl_lib = ctypes.CDLL(_SSL_LIB)
    _ssl_lib.ssl_step.argtypes = [
        ctypes.POINTER(_CSSLField),
        ctypes.POINTER(_CSSLPhysics),
        ctypes.c_float,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    _ssl_lib.ssl_step.restype = None
    return _ssl_lib


def ssl_step_native(
    field: FieldParams,
    cfg: PhysicsConfig,
    dt: float,
    ball: np.ndarray,  # (6,) x, y, z, vx, vy, vz — modified in place
    robots: np.ndarray,  # (N, 6) x, y, theta, vx, vy, vtheta — in place
    commands: np.ndarray,  # (N, 11) [wheel_speed, vw0..3, vx, vy, vtheta,
    #                                 kick_v_x, kick_v_z, dribbler]
):
    """Steps the world in place; returns (infrared (N,), v_wheel (N, 4))."""
    lib = _ensure_ssl_built()
    n = robots.shape[0]
    cf = _CSSLField(
        ball_radius=field.ball_radius,
        rbt_radius=field.rbt_radius,
        wheel_radius=field.rbt_wheel_radius,
        max_wheel_rad_s=field.max_wheel_rad_s,
        wheel_angle_deg=(ctypes.c_float * 4)(
            field.rbt_wheel0_angle,
            field.rbt_wheel1_angle,
            field.rbt_wheel2_angle,
            field.rbt_wheel3_angle,
        ),
        rbt_distance_center_kicker=field.rbt_distance_center_kicker,
        rbt_kicker_thickness=field.rbt_kicker_thickness,
        rbt_kicker_width=field.rbt_kicker_width,
    )
    cp = _CSSLPhysics(
        n_substeps=cfg.n_substeps,
        robot_accel=cfg.robot_accel,
        robot_alpha=cfg.robot_alpha,
        ball_friction_decel=cfg.ball_friction_decel,
        rest_ball_robot=cfg.rest_ball_robot,
        rest_dribbler=cfg.rest_dribbler,
        rest_robot_robot=cfg.rest_robot_robot,
        gravity=cfg.gravity,
        rest_ball_ground=cfg.rest_ball_ground,
        ball_bounce_min_v=cfg.ball_bounce_min_v,
        rbt_height=cfg.rbt_height,
        kicker_height=cfg.kicker_height,
        kicker_depth_slack=cfg.kicker_depth_slack,
        dribbler_pull_accel=cfg.dribbler_pull_accel,
        dribbler_damping=cfg.dribbler_damping,
        dribbler_capture_speed=cfg.dribbler_capture_speed,
        dribbler_reach=cfg.dribbler_reach,
    )
    ball_c = np.ascontiguousarray(ball, np.float32)
    robots_c = np.ascontiguousarray(robots, np.float32)
    cmds_c = np.ascontiguousarray(commands, np.float32)
    out_ir = np.zeros((n,), np.float32)
    out_wheels = np.zeros((n, 4), np.float32)
    lib.ssl_step(
        ctypes.byref(cf), ctypes.byref(cp), ctypes.c_float(dt), n,
        ball_c.reshape(-1), robots_c.reshape(-1), cmds_c.reshape(-1),
        out_ir, out_wheels.reshape(-1),
    )
    ball[:] = ball_c
    robots[:] = robots_c
    return out_ir > 0.5, out_wheels
