"""Scripted-expert regression tests.

The dribbling expert proves BY CONSTRUCTION that the SSLDribbling course is
completable under this framework's physics.  A physics regression that
breaks turn-while-carrying (e.g. the round-2 dribbler bug where the ball
was damped against the robot-center velocity instead of the face-point
velocity) silently makes the task unlearnable — this test turns that class
of regression into a hard failure.
"""

import jax
import jax.numpy as jnp

import rsoccer_tpu
from rsoccer_tpu.envs.base import draw_noise, strongify
from rsoccer_tpu.experts import dribbling_expert, pass_endurance_expert


def _run(env, state, length):
    """Scan the expert through raw transitions, freezing at termination.

    Returns (terminated, completed, min robot-yellow distance, steps)."""
    noise = draw_noise(jax.random.PRNGKey(0), env.transition_noise_spec())

    def body(carry, _):
        st, done_ever, completed, mind, steps = carry
        act = dribbling_expert(st)
        ns, r, term, info = env.transition(st, act, noise)
        comp = term & (ns.checkpoints == 7) & ~done_ever
        rb = ns.world.robots
        d = jnp.min(jnp.hypot(rb.x[0] - rb.x[1:], rb.y[0] - rb.y[1:]))
        mind = jnp.where(done_ever, mind, jnp.minimum(mind, d))
        steps = jnp.where(done_ever, steps, ns.steps)
        out = jax.tree.map(lambda a, b: jnp.where(done_ever, a, b), st, ns)
        return (out, done_ever | term, completed | comp, mind, steps), None

    init = (state, jnp.asarray(False), jnp.asarray(False), jnp.asarray(9.9),
            jnp.zeros((), jnp.int32))
    (_, de, comp, mind, steps), _ = jax.lax.scan(body, init, None, length=length)
    return de, comp, mind, steps


def test_dribbling_expert_completes_reference_course():
    env = rsoccer_tpu.make("SSLDribbling-v0")
    state, _ = env.reset(jax.random.PRNGKey(0))
    de, comp, mind, steps = jax.jit(lambda s: _run(env, s, 1200))(state)
    assert bool(comp), "expert failed the reference course"
    assert int(steps) < 1200
    # clearance to every yellow stays above the 0.18 m contact radius
    assert float(mind) > 0.18


def test_pass_endurance_expert_success():
    """Aim-and-kick completes the pass on (nearly) every reference reset.

    This pins the receiving physics end to end: kick release accuracy,
    the dribbler-face bounce absorption (rest_dribbler) and the dribbler
    attraction reach — with body restitution alone a minimum-power pass
    rebounds off the receiver and success was luck-limited (measured 9%);
    with the face physics it is deterministic (512/512 at tuning time).
    """
    env = rsoccer_tpu.make("SSLPassEndurance-v0")
    B = 128
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    reset = jax.vmap(
        lambda k: strongify(env.reset_state(draw_noise(k, env.reset_noise_spec())))
    )
    states = reset(keys)
    noise = draw_noise(jax.random.PRNGKey(0), env.transition_noise_spec())

    def one(state):
        def body(carry, _):
            st, done_ever, success = carry
            act = pass_endurance_expert(st)
            ns, r, term, info = env.transition(st, act, noise)
            succ = term & (r > 0.5) & ~done_ever
            out = jax.tree.map(lambda a, b: jnp.where(done_ever, a, b), st, ns)
            return (out, done_ever | term, success | succ), None

        init = (state, jnp.asarray(False), jnp.asarray(False))
        (_, de, succ), _ = jax.lax.scan(body, init, None, length=400)
        return succ

    succ = jax.jit(jax.vmap(one))(states)
    assert int(succ.sum()) >= int(0.97 * B)


def test_dribbling_expert_from_curriculum_spawns():
    """Vmapped completion rate from mid-course curriculum resets."""
    env = rsoccer_tpu.make("SSLDribbling-v0", curriculum=True)
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    reset = jax.vmap(
        lambda k: strongify(env.reset_state(draw_noise(k, env.reset_noise_spec())))
    )
    states = reset(keys)
    de, comp, _, _ = jax.jit(jax.vmap(lambda s: _run(env, s, 2000)))(states)
    # the expert is tuned for the reference start; mid-course spawns place
    # the ball in awkward window positions — expect a strong majority, not
    # perfection (measured 54/64 at tuning time)
    assert int(comp.sum()) >= int(0.6 * B)


def test_static_defenders_expert_scores_most_episodes():
    """The scripted SD expert must clear ~90% goals on reference-exact
    resets — proving by construction that fetch-behind-ball, carry with
    defender avoidance, and the exact heading-ray kick gate compose to
    beat the task under this physics (tuning-time measurement: ~95% over
    3k+ episodes; threshold leaves CI headroom)."""
    import functools

    from rsoccer_tpu.batch.vecenv import BatchedEnv
    from rsoccer_tpu.experts import static_defenders_expert

    env = rsoccer_tpu.make("SSLStaticDefenders-v0")
    benv = BatchedEnv(env, 64)
    expert_v = jax.vmap(
        functools.partial(static_defenders_expert, field=env.field),
        in_axes=-1, out_axes=-1,
    )

    @jax.jit
    def run(key):
        kr, ks = jax.random.split(key)
        st, obs = benv.reset(kr)

        def body(carry, key):
            st, obs = carry
            act = expert_v(st)
            st, obs, r, term, trunc, info = benv.step(st, act, key)
            done = term | trunc
            win = done & (r >= 4.5)
            gk = done * info["rbt_in_gk_area"]
            return (st, obs), (done.sum(), win.sum(), gk.sum())

        keys = jax.random.split(ks, 700)
        _, (d, w, g) = jax.lax.scan(body, (st, obs), keys)
        return d.sum(), w.sum(), g.sum()

    d, w, g = map(float, run(jax.random.PRNGKey(3)))
    assert d >= 200, f"too few episodes finished ({d})"
    assert w / d >= 0.88, f"expert goal rate {w/d:.3f} below floor"
    # the GK-area barrier must hold exactly
    assert g == 0, f"expert entered the GK area {g} times"
