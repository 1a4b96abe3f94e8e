"""Full-step Pallas kernel vs the default XLA path (interpret mode on CPU).

The fused kernel must reproduce the vmapped XLA step bit-for-bit-ish given
the same pre-drawn noise: observations, rewards, termination flags, info
accumulators AND the full unpacked state, including across auto-resets.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rsoccer_tpu
from rsoccer_tpu.batch.vecenv import BatchedEnv


@pytest.fixture()
def interp_full(monkeypatch):
    """Force interpret mode for the full-step kernels on CPU."""
    import rsoccer_tpu.ops.pallas_ssl_full as psf
    import rsoccer_tpu.ops.pallas_vss_full as pvf

    for mod, name in [
        (pvf, "make_pallas_vss_full_step"),
        (psf, "make_pallas_sd_full_step"),
        (psf, "make_pallas_cp_full_step"),
        (psf, "make_pallas_dr_full_step"),
        (psf, "make_pallas_pe_full_step"),
    ]:
        monkeypatch.setattr(
            mod, name, functools.partial(getattr(mod, name), interpret=True)
        )


def _run_pair(
    n_steps=6, n_envs=8, max_episode_steps=None, seed=0, env_id="VSS-v0"
):
    env = rsoccer_tpu.make(env_id)
    if max_episode_steps is not None:
        env.max_episode_steps = max_episode_steps
    ref = BatchedEnv(env, n_envs)
    ful = BatchedEnv(env, n_envs, pallas_full=True, pallas_tile=n_envs)
    key = jax.random.PRNGKey(seed)
    s_ref, o_ref = ref.reset(key)
    s_ful, o_ful = ful.reset(key)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_ful), atol=1e-6)
    rng = np.random.default_rng(seed + 1)
    outs = []
    for t in range(n_steps):
        acts = jnp.asarray(
            rng.uniform(-1, 1, (env.action_size, n_envs)), jnp.float32
        )
        k = jax.random.PRNGKey(100 + t)
        ref_out = ref.step(s_ref, acts, k)
        ful_out = ful.step(s_ful, acts, k)
        s_ref, s_ful = ref_out[0], ful_out[0]
        outs.append((ref_out, ful_out))
    return ref, ful, s_ref, s_ful, outs


def test_full_step_matches_default(interp_full):
    ref, ful, s_ref, s_ful, outs = _run_pair()
    for t, (r, f) in enumerate(outs):
        _, o_r, rew_r, te_r, tr_r, i_r = r
        _, o_f, rew_f, te_f, tr_f, i_f = f
        np.testing.assert_allclose(
            np.asarray(o_r), np.asarray(o_f), atol=5e-5,
            err_msg=f"obs diverged at step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(rew_r), np.asarray(rew_f), atol=5e-5,
            err_msg=f"reward diverged at step {t}",
        )
        np.testing.assert_array_equal(np.asarray(te_r), np.asarray(te_f))
        np.testing.assert_array_equal(np.asarray(tr_r), np.asarray(tr_f))
        assert set(i_r) == set(i_f)
        for k_ in i_r:
            np.testing.assert_allclose(
                np.asarray(i_r[k_]), np.asarray(i_f[k_]), atol=5e-5,
                err_msg=f"info[{k_}] diverged at step {t}",
            )


def test_full_step_state_matches_unpacked(interp_full):
    ref, ful, s_ref, s_ful, _ = _run_pair(n_steps=4)
    unpacked = ful.unpack_state(s_ful)
    for name in ("x", "y", "z", "v_x", "v_y", "v_z"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_ref.world.ball, name)),
            np.asarray(getattr(unpacked.world.ball, name)),
            atol=5e-5, err_msg=f"ball.{name}",
        )
    for name in ("x", "y", "theta", "v_x", "v_y", "v_theta", "v_wheel"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_ref.world.robots, name)),
            np.asarray(getattr(unpacked.world.robots, name)),
            atol=5e-5, err_msg=f"robots.{name}",
        )
    np.testing.assert_array_equal(
        np.asarray(s_ref.steps), np.asarray(unpacked.steps)
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.ou_x), np.asarray(unpacked.ou_x), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.shaping), np.asarray(unpacked.shaping), atol=5e-5
    )


def test_full_step_matches_through_autoreset(interp_full):
    """Shrunk horizon forces truncation + spawn resets inside the window —
    the spawn placement and reset select must agree lane-for-lane."""
    ref, ful, s_ref, s_ful, outs = _run_pair(
        n_steps=8, max_episode_steps=3, seed=3
    )
    saw_done = False
    for t, (r, f) in enumerate(outs):
        _, o_r, _, te_r, tr_r, _ = r
        _, o_f, _, te_f, tr_f, _ = f
        saw_done = saw_done or bool(np.asarray(tr_r).any())
        np.testing.assert_allclose(
            np.asarray(o_r), np.asarray(o_f), atol=5e-5,
            err_msg=f"obs diverged at step {t}",
        )
        np.testing.assert_array_equal(np.asarray(tr_r), np.asarray(tr_f))
    assert saw_done
    # states equal after resets too
    unpacked = ful.unpack_state(s_ful)
    np.testing.assert_allclose(
        np.asarray(s_ref.world.ball.x), np.asarray(unpacked.world.ball.x),
        atol=5e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(s_ref.steps), np.asarray(unpacked.steps)
    )


_SSL_IDS = [
    "SSLStaticDefenders-v0",
    "SSLContestedPossession-v0",
    "SSLDribbling-v0",
    "SSLPassEndurance-v0",
]


@pytest.mark.parametrize("env_id", _SSL_IDS)
def test_ssl_full_step_matches_default(interp_full, env_id):
    """Each SSL full-step kernel vs the vmapped XLA path."""
    ref, ful, s_ref, s_ful, outs = _run_pair(n_steps=6, env_id=env_id, seed=5)
    for t, (r, f) in enumerate(outs):
        _, o_r, rew_r, te_r, tr_r, i_r = r
        _, o_f, rew_f, te_f, tr_f, i_f = f
        np.testing.assert_allclose(
            np.asarray(o_r), np.asarray(o_f), atol=5e-5,
            err_msg=f"{env_id} obs diverged at step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(rew_r), np.asarray(rew_f), atol=5e-5,
            err_msg=f"{env_id} reward diverged at step {t}",
        )
        np.testing.assert_array_equal(np.asarray(te_r), np.asarray(te_f))
        assert set(i_r) == set(i_f)
        for k_ in i_r:
            np.testing.assert_allclose(
                np.asarray(i_r[k_]), np.asarray(i_f[k_]), atol=5e-5,
                err_msg=f"{env_id} info[{k_}] diverged at step {t}",
            )
    up = ful.unpack_state(s_ful)
    np.testing.assert_allclose(
        np.asarray(s_ref.world.robots.x), np.asarray(up.world.robots.x),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.world.ball.x), np.asarray(up.world.ball.x), atol=5e-5
    )
    np.testing.assert_array_equal(
        np.asarray(s_ref.steps), np.asarray(up.steps)
    )


@pytest.mark.parametrize("env_id", _SSL_IDS)
def test_ssl_full_step_matches_through_autoreset(interp_full, env_id):
    ref, ful, s_ref, s_ful, outs = _run_pair(
        n_steps=8, env_id=env_id, max_episode_steps=3, seed=11
    )
    saw_done = False
    for t, (r, f) in enumerate(outs):
        _, o_r, _, te_r, tr_r, _ = r
        _, o_f, _, te_f, tr_f, _ = f
        saw_done = saw_done or bool(np.asarray(tr_r).any())
        np.testing.assert_allclose(
            np.asarray(o_r), np.asarray(o_f), atol=5e-5,
            err_msg=f"{env_id} obs diverged at step {t}",
        )
        np.testing.assert_array_equal(np.asarray(tr_r), np.asarray(tr_f))
        np.testing.assert_array_equal(np.asarray(te_r), np.asarray(te_f))
    assert saw_done


def test_sd_full_step_matches_default(interp_full):
    """SSLStaticDefenders full-step kernel vs the vmapped XLA path."""
    ref, ful, s_ref, s_ful, outs = _run_pair(
        n_steps=6, env_id="SSLStaticDefenders-v0", seed=5
    )
    for t, (r, f) in enumerate(outs):
        _, o_r, rew_r, te_r, tr_r, i_r = r
        _, o_f, rew_f, te_f, tr_f, i_f = f
        np.testing.assert_allclose(
            np.asarray(o_r), np.asarray(o_f), atol=5e-5,
            err_msg=f"obs diverged at step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(rew_r), np.asarray(rew_f), atol=5e-5,
            err_msg=f"reward diverged at step {t}",
        )
        np.testing.assert_array_equal(np.asarray(te_r), np.asarray(te_f))
        assert set(i_r) == set(i_f)
        for k_ in i_r:
            np.testing.assert_allclose(
                np.asarray(i_r[k_]), np.asarray(i_f[k_]), atol=5e-5,
                err_msg=f"info[{k_}] diverged at step {t}",
            )
    # unpacked state agrees (infrared for robot 0, wheel speeds, shaping)
    up = ful.unpack_state(s_ful)
    np.testing.assert_allclose(
        np.asarray(s_ref.world.robots.x), np.asarray(up.world.robots.x),
        atol=5e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(s_ref.world.robots.infrared[0]),
        np.asarray(up.world.robots.infrared[0]),
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.world.robots.v_wheel[0]),
        np.asarray(up.world.robots.v_wheel[0]), atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.shaping), np.asarray(up.shaping), atol=5e-5
    )


def test_sd_full_step_matches_through_autoreset(interp_full):
    ref, ful, s_ref, s_ful, outs = _run_pair(
        n_steps=8, env_id="SSLStaticDefenders-v0",
        max_episode_steps=3, seed=9,
    )
    saw_done = False
    for t, (r, f) in enumerate(outs):
        _, o_r, _, te_r, tr_r, _ = r
        _, o_f, _, te_f, tr_f, _ = f
        saw_done = saw_done or bool(np.asarray(tr_r).any())
        np.testing.assert_allclose(
            np.asarray(o_r), np.asarray(o_f), atol=5e-5,
            err_msg=f"obs diverged at step {t}",
        )
        np.testing.assert_array_equal(np.asarray(tr_r), np.asarray(tr_f))
    assert saw_done
    up = ful.unpack_state(s_ful)
    np.testing.assert_allclose(
        np.asarray(s_ref.world.ball.x), np.asarray(up.world.ball.x), atol=5e-5
    )
    np.testing.assert_array_equal(
        np.asarray(s_ref.steps), np.asarray(up.steps)
    )


def test_full_step_rollout_driver_compatible(interp_full):
    """The packed state flows through make_rollout_fn's scan opaquely."""
    from rsoccer_tpu.batch import rollout as R

    env = rsoccer_tpu.make("VSS-v0")
    ful = BatchedEnv(env, 8, pallas_full=True, pallas_tile=8)
    carry = R.init_carry(ful, jax.random.PRNGKey(0))
    carry, ms = jax.jit(R.make_rollout_fn(ful, 20))(carry)
    assert np.isfinite(float(ms.total_reward))
    assert bool(jnp.isfinite(carry.obs).all())


@pytest.mark.parametrize(
    "kwargs",
    [
        {"field_type": 1, "n_robots_blue": 5, "n_robots_yellow": 5},
        {"n_robots_blue": 1, "n_robots_yellow": 0},  # no collision pairs
    ],
)
def test_full_step_matches_default_custom_configs(interp_full, kwargs):
    """The VSS kernel is robot-count generic (pair lists, spawn rows,
    state layout all derive from n) — pin equivalence on a 5v5 world and
    the degenerate single-robot world."""
    from rsoccer_tpu.envs import VSSEnv

    env = VSSEnv(**kwargs)
    env.max_episode_steps = 16  # force auto-resets through the kernel
    ref = BatchedEnv(env, 8)
    ful = BatchedEnv(env, 8, pallas_full=True, pallas_tile=8)
    key = jax.random.PRNGKey(2)
    s_ref, o_ref = ref.reset(key)
    s_ful, o_ful = ful.reset(key)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_ful), atol=1e-6)
    rng = np.random.default_rng(3)
    for t in range(20):
        acts = jnp.asarray(rng.uniform(-1, 1, (2, 8)), jnp.float32)
        k = jax.random.PRNGKey(200 + t)
        s_ref, o_r, rew_r, te_r, tr_r, _ = ref.step(s_ref, acts, k)
        s_ful, o_f, rew_f, te_f, tr_f, _ = ful.step(s_ful, acts, k)
        np.testing.assert_allclose(
            np.asarray(o_r), np.asarray(o_f), atol=5e-5,
            err_msg=f"obs diverged at step {t} ({kwargs})",
        )
        np.testing.assert_allclose(
            np.asarray(rew_r), np.asarray(rew_f), atol=5e-5,
        )
        np.testing.assert_array_equal(np.asarray(te_r), np.asarray(te_f))
        np.testing.assert_array_equal(np.asarray(tr_r), np.asarray(tr_f))


_ALL_IDS = ["VSS-v0"] + _SSL_IDS


@pytest.mark.parametrize("env_id", _ALL_IDS)
def test_full_step_final_matches_default(interp_full, env_id):
    """step_final on the fused path: post-reset obs AND the final
    (pre-reset) obs must match the XLA path lane-for-lane, through
    auto-resets (shrunk horizon forces truncations in-window)."""
    env = rsoccer_tpu.make(env_id)
    env.max_episode_steps = 3
    n_envs = 8
    ref = BatchedEnv(env, n_envs)
    ful = BatchedEnv(env, n_envs, pallas_full=True, pallas_tile=n_envs)
    assert ful.supports_step_final
    key = jax.random.PRNGKey(7)
    s_ref, o_ref = ref.reset(key)
    s_ful, o_ful = ful.reset(key)
    rng = np.random.default_rng(7)
    saw_done = False
    for t in range(8):
        acts = jnp.asarray(
            rng.uniform(-1, 1, (env.action_size, n_envs)), jnp.float32
        )
        k = jax.random.PRNGKey(300 + t)
        s_ref, o_r, f_r, rew_r, te_r, tr_r, i_r = ref.step_final(
            s_ref, acts, k
        )
        s_ful, o_f, f_f, rew_f, te_f, tr_f, i_f = ful.step_final(
            s_ful, acts, k
        )
        done = np.asarray(te_r) | np.asarray(tr_r)
        saw_done = saw_done or bool(done.any())
        np.testing.assert_allclose(
            np.asarray(o_r), np.asarray(o_f), atol=5e-5,
            err_msg=f"{env_id} obs diverged at step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(f_r), np.asarray(f_f), atol=5e-5,
            err_msg=f"{env_id} final_obs diverged at step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(rew_r), np.asarray(rew_f), atol=5e-5,
            err_msg=f"{env_id} reward diverged at step {t}",
        )
        np.testing.assert_array_equal(np.asarray(te_r), np.asarray(te_f))
        np.testing.assert_array_equal(np.asarray(tr_r), np.asarray(tr_f))
        # on non-done lanes final_obs == obs up to trig representation:
        # the final-obs build reuses the physics' composed heading trig
        # while the VSS post-obs recomputes exact sin/cos (~1e-6 apart)
        np.testing.assert_allclose(
            np.asarray(o_f)[:, ~done], np.asarray(f_f)[:, ~done], atol=5e-6,
            err_msg=f"{env_id} final_obs != obs on a non-done lane",
        )
    assert saw_done
