"""Episode video export via the host renderer.

Rolls a policy in a single functional env, renders every frame host-side,
and writes an animated GIF (pure-numpy encoder fallback keeps this
dependency-free; imageio is used when present).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np

from rsoccer_tpu.core.frame import frame_from_world
from rsoccer_tpu.render.renderer import Renderer


def record_episode(
    env,
    policy: Optional[Callable] = None,
    seed: int = 0,
    max_steps: int = 600,
    every: int = 2,
):
    """Roll one episode, returning a list of HxWx3 uint8 frames.

    ``policy(key, obs) -> action`` on single-env shapes; defaults to uniform
    random.  ``every`` subsamples frames (2 -> 20 fps at the 40 Hz step).
    """
    renderer = Renderer(env.league, "rgb_array")
    key = jax.random.PRNGKey(seed)
    key, k = jax.random.split(key)
    state, obs = env.reset(k)
    step = jax.jit(env.step_env)
    frames = []
    for t in range(max_steps):
        if t % every == 0:
            frames.append(
                renderer.render_frame(
                    frame_from_world(state.world, env.n_blue, env.n_yellow)
                )
            )
        key, ka, ks = jax.random.split(key, 3)
        if policy is None:
            action = jax.random.uniform(
                ka, (env.action_size,), minval=-1.0, maxval=1.0
            )
        else:
            action = policy(ka, obs)
        state, obs, reward, done, info = step(state, action, ks)
        if bool(done):
            break
    renderer.close()
    return frames


def save_gif(frames, path: str, fps: int = 20):
    """Write frames to an animated GIF (imageio if present, else PIL)."""
    try:
        import imageio

        imageio.mimsave(path, frames, fps=fps)
        return path
    except ImportError:
        pass
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=int(1000 / fps),
        loop=0,
    )
    return path
