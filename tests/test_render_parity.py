"""Pixel-level render parity against the reference painters.

The reference's Render package (Render/{field,robot,ball}.py) is importable
without the robosim binary, so when the reference checkout is present we can
draw the *same scene* twice — once with the reference's class-hierarchy
painters driven exactly as vss_gym_base._render / ssl_gym_base._render drive
them (pos_transform -> painter objects -> draw order field/blue/yellow/ball),
and once with this framework's compact ``Renderer`` — and require the two
RGB buffers to agree pixel-for-pixel.

This is a golden test, not a code dependency: the suite skips cleanly when
``/root/reference`` (or pygame) is absent.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

pygame = pytest.importorskip("pygame")

if not os.path.isdir(os.path.join(REFERENCE_ROOT, "rsoccer_gym", "Render")):
    pytest.skip("reference checkout not available", allow_module_level=True)

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

# Import the reference's Render modules WITHOUT executing
# rsoccer_gym/__init__.py: that module registers the reference's gymnasium
# entry points for the same five ids (robosim-backed — not importable here),
# which would shadow this framework's registrations for every test collected
# after this file.  A stub package with the real __path__ lets submodule
# imports resolve while the package __init__ never runs.
import types  # noqa: E402

if "rsoccer_gym" not in sys.modules:
    _pkg = types.ModuleType("rsoccer_gym")
    _pkg.__path__ = [os.path.join(REFERENCE_ROOT, "rsoccer_gym")]
    sys.modules["rsoccer_gym"] = _pkg

from rsoccer_gym.Render.ball import Ball as RefBall  # noqa: E402
from rsoccer_gym.Render.field import (  # noqa: E402
    SSLRenderField,
    VSSRenderField,
)
from rsoccer_gym.Render.robot import SSLRobot, VSSRobot  # noqa: E402
from rsoccer_gym.Render.utils import COLORS as REF_COLORS  # noqa: E402

from rsoccer_tpu.core.frame import Ball, Frame, Robot  # noqa: E402
from rsoccer_tpu.render.renderer import Renderer  # noqa: E402

# Fixed scene: (x_m, y_m, theta_deg) per robot.  Mix of axis-aligned and
# arbitrary angles so both the blit fast path and the rotation path are
# compared.
VSS_BLUE = [(-0.3, 0.0, 0.0), (0.2, 0.31, 90.0), (-0.55, -0.42, 37.5)]
VSS_YELLOW = [(0.5, 0.1, 180.0), (0.12, -0.3, 270.0), (0.61, 0.47, 203.25)]
VSS_BALL = (0.05, -0.12)

SSL_BLUE = [(-1.2, 0.0, 0.0), (0.8, 1.4, 45.0)]
SSL_YELLOW = [(2.2, -0.9, 180.0), (-3.1, 2.0, 312.0), (0.0, -2.4, 90.0)]
SSL_BALL = (0.3, 0.55)


def _reference_vss_image():
    """Drive the reference painters exactly as vss_gym_base._render does
    (vss_gym_base.py:108-146): pos_transform, field.draw, VSSRobot per blue
    then yellow, ball last."""
    field = VSSRenderField()
    surface = pygame.Surface(field.window_size)

    def pos_transform(px, py):
        return (
            int(px * field.scale + field.center_x),
            int(py * field.scale + field.center_y),
        )

    field.draw(surface)
    for i, (x, y, th) in enumerate(VSS_BLUE):
        VSSRobot(*pos_transform(x, y), th, field.scale, i, REF_COLORS["BLUE"]).draw(
            surface
        )
    for i, (x, y, th) in enumerate(VSS_YELLOW):
        VSSRobot(*pos_transform(x, y), th, field.scale, i, REF_COLORS["YELLOW"]).draw(
            surface
        )
    RefBall(*pos_transform(*VSS_BALL), field.scale).draw(surface)
    return np.transpose(np.array(pygame.surfarray.pixels3d(surface)), (1, 0, 2))


def _reference_ssl_image():
    """ssl_gym_base._render is the same loop with SSLRenderField/SSLRobot
    (ssl_gym_base.py:107-146)."""
    field = SSLRenderField()
    surface = pygame.Surface(field.window_size)

    def pos_transform(px, py):
        return (
            int(px * field.scale + field.center_x),
            int(py * field.scale + field.center_y),
        )

    field.draw(surface)
    for i, (x, y, th) in enumerate(SSL_BLUE):
        SSLRobot(*pos_transform(x, y), th, field.scale, i, REF_COLORS["BLUE"]).draw(
            surface
        )
    for i, (x, y, th) in enumerate(SSL_YELLOW):
        SSLRobot(*pos_transform(x, y), th, field.scale, i, REF_COLORS["YELLOW"]).draw(
            surface
        )
    RefBall(*pos_transform(*SSL_BALL), field.scale).draw(surface)
    return np.transpose(np.array(pygame.surfarray.pixels3d(surface)), (1, 0, 2))


def _frame(blue, yellow, ball):
    return Frame(
        ball=Ball(x=ball[0], y=ball[1], z=0.0),
        robots_blue={
            i: Robot(yellow=False, id=i, x=x, y=y, theta=th)
            for i, (x, y, th) in enumerate(blue)
        },
        robots_yellow={
            i: Robot(yellow=True, id=i, x=x, y=y, theta=th)
            for i, (x, y, th) in enumerate(yellow)
        },
    )


def _assert_images_match(ours, ref):
    assert ours.shape == ref.shape, f"window size differs: {ours.shape} vs {ref.shape}"
    mismatch = np.mean(np.any(ours != ref, axis=-1))
    # Identical draw calls through the same pygame produce identical buffers;
    # allow a whisper of slack for antialiased-rotation differences across
    # pygame builds.
    assert mismatch < 0.001, f"{mismatch:.4%} of pixels differ from the reference render"


def test_vss_render_matches_reference_pixels():
    ours = Renderer("vss", render_mode="rgb_array").render_frame(
        _frame(VSS_BLUE, VSS_YELLOW, VSS_BALL)
    )
    _assert_images_match(ours, _reference_vss_image())


def test_ssl_render_matches_reference_pixels():
    ours = Renderer("ssl", render_mode="rgb_array").render_frame(
        _frame(SSL_BLUE, SSL_YELLOW, SSL_BALL)
    )
    _assert_images_match(ours, _reference_ssl_image())
