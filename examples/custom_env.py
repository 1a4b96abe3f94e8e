"""Authoring a custom task env — the functional-API equivalent of the
reference README's custom-env example (subclass + 4 hook overrides,
reference README.md:60-112): define reset/observe/reward on top of the
shared physics.

Task: single VSS robot must touch the ball, which starts at the penalty
edge.  Reward 1 and terminate on touch.
"""

import os
import sys
from typing import NamedTuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rsoccer_tpu.core.field import vss_field
from rsoccer_tpu.core.state import BallState, RobotsState, VSSCommands, WorldState
from rsoccer_tpu.envs.base import Env
from rsoccer_tpu.physics.config import VSS_PHYSICS
from rsoccer_tpu.physics.vss import make_vss_step


class ReachState(NamedTuple):
    world: WorldState
    steps: jnp.ndarray


class ReachBallEnv(Env):
    """1 blue robot, fixed spawn, touch-the-ball task."""

    obs_size = 6
    action_size = 2
    max_episode_steps = 300
    league = "vss"

    def __init__(self):
        self.field = vss_field(0)
        self.n_blue, self.n_yellow = 1, 0
        self._physics = make_vss_step(self.field, VSS_PHYSICS, 0.025)

    def reset_state(self, key):
        f = self.field
        world = WorldState(
            ball=BallState(
                x=jnp.asarray(f.half_length - f.penalty_length),
                y=jnp.zeros(()), z=jnp.asarray(f.ball_radius),
                v_x=jnp.zeros(()), v_y=jnp.zeros(()), v_z=jnp.zeros(()),
            ),
            robots=RobotsState(
                x=jnp.zeros((1,)), y=jnp.zeros((1,)), theta=jnp.zeros((1,)),
                v_x=jnp.zeros((1,)), v_y=jnp.zeros((1,)),
                v_theta=jnp.zeros((1,)),
                infrared=jnp.zeros((1,), bool), v_wheel=jnp.zeros((1, 4)),
            ),
        )
        return ReachState(world=world, steps=jnp.zeros((), jnp.int32))

    def _observe(self, world):
        return jnp.stack(
            [
                world.ball.x, world.ball.y,
                world.robots.x[0], world.robots.y[0],
                jnp.sin(world.robots.theta[0]), jnp.cos(world.robots.theta[0]),
            ]
        ).astype(jnp.float32)

    def observe(self, state):
        return self._observe(state.world)

    def transition(self, state, action, key):
        max_wheel = self.field.max_wheel_rad_s
        cmd = VSSCommands(
            v_wheel0=action[:1] * max_wheel, v_wheel1=action[1:] * max_wheel
        )
        world = self._physics(state.world, cmd)
        dist = jnp.hypot(
            world.ball.x - world.robots.x[0], world.ball.y - world.robots.y[0]
        )
        touched = dist < self.field.rbt_radius + self.field.ball_radius + 0.01
        reward = jnp.where(touched, 1.0, 0.0)
        ns = ReachState(world=world, steps=state.steps + 1)
        return ns, reward, touched, {}


if __name__ == "__main__":
    env = ReachBallEnv()
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    total = 0.0
    for t in range(300):
        # drive straight at the ball (it is dead ahead at reset)
        state, obs, r, term, trunc, info = step(
            state, jnp.asarray([1.0, 1.0]), jax.random.PRNGKey(t)
        )
        total += float(r)
        if bool(term):
            print(f"touched the ball at step {t}, reward {total}")
            break
    else:
        print("never touched the ball (unexpected)")
