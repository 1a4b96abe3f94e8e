"""Renderer unit tests: visual constants match the reference and frames
draw deterministically."""

import numpy as np
import pytest

from rsoccer_tpu.render.colors import COLORS, VSS_TAG_COLORS, ssl_tag_colors
from rsoccer_tpu.render.renderer import (
    BALL_RADIUS,
    SSL_GEOMETRY,
    VSS_GEOMETRY,
    Renderer,
)


def test_colors_match_reference_values():
    # reference Render/utils.py:2-15
    assert COLORS["BG_GREEN"] == (20, 90, 45)
    assert COLORS["ORANGE"] == (253, 106, 2)
    assert COLORS["BLUE"] == (0, 64, 255)
    assert COLORS["YELLOW"] == (250, 218, 94)
    assert COLORS["PINK"] == (220, 0, 220)
    assert COLORS["GREEN"] == (57, 220, 20)


def test_vss_tag_colors():
    # reference Render/robot.py:86 — ids 0/1/2 -> green/purple/red
    assert VSS_TAG_COLORS[0] == COLORS["GREEN"]
    assert VSS_TAG_COLORS[1] == COLORS["PURPLE"]
    assert VSS_TAG_COLORS[2] == COLORS["RED"]


def test_ssl_tag_patterns_match_reference_table():
    # reference Render/utils.py:17-114 — spot-check several ids
    P, G = COLORS["PINK"], COLORS["GREEN"]
    assert ssl_tag_colors(0) == [P, G, P, P]
    assert ssl_tag_colors(3) == [P, G, P, G]
    assert ssl_tag_colors(8) == [G, G, G, G]
    assert ssl_tag_colors(9) == [P, P, P, P]
    assert ssl_tag_colors(15) == [P, P, P, G]


def test_geometry_scales():
    # reference Render/field.py:189-264 — px/m scales and field dims
    assert VSS_GEOMETRY.scale == 500.0 and VSS_GEOMETRY.length == 1.5
    assert SSL_GEOMETRY.scale == 100.0 and SSL_GEOMETRY.length == 9.0
    assert BALL_RADIUS == 0.0215


def test_render_deterministic():
    import jax

    import rsoccer_tpu
    from rsoccer_tpu.core.frame import frame_from_world

    env = rsoccer_tpu.make("VSS-v0")
    state, _ = env.reset(jax.random.PRNGKey(0))
    frame = frame_from_world(state.world, 3, 3)
    r = Renderer("vss", "rgb_array")
    img1 = r.render_frame(frame)
    img2 = r.render_frame(frame)
    np.testing.assert_array_equal(img1, img2)
    assert img1.shape == (r.window_size[1], r.window_size[0], 3)
    # background green dominates the image
    bg = (img1 == np.array(COLORS["BG_GREEN"])).all(axis=-1).mean()
    assert bg > 0.5
    r.close()
