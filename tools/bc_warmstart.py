"""Behavior-cloning warm start from a scripted expert.

Collects (obs, action) pairs by rolling a scripted expert (rsoccer_tpu.experts)
through the batched env, fits the PPO actor's mean head to the expert actions,
and writes a ``{params, obs_norm}`` checkpoint that
``examples/train_ppo_vss.py --init`` can fine-tune.

Why: SSLDribbling's reward is +1 per gate with ~2.7 crossings per 1M
random-policy steps from the reference start (measured) — vanilla PPO
converges to a do-nothing policy.  The scripted expert completes the course
(tests/test_experts.py); cloning it puts PPO's starting point past the
exploration cliff.

    python tools/bc_warmstart.py --save artifacts/drb_bc.ckpt
    python examples/train_ppo_vss.py --env-id SSLDribbling-v0 \
        --env-kwargs '{"curriculum": true}' --init artifacts/drb_bc.ckpt ...
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from rsoccer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import rsoccer_tpu
from rsoccer_tpu.batch.vecenv import BatchedEnv
from rsoccer_tpu.experts import (
    dribbling_expert,
    pass_endurance_expert,
    static_defenders_expert,
)
from rsoccer_tpu.models.networks import ActorCritic
from rsoccer_tpu.models.ppo import ObsNorm, PPOTrainer
from rsoccer_tpu.utils import checkpoint

# env -> expert factory (some experts need the env's field geometry)
EXPERTS = {
    "SSLDribbling-v0": lambda env: dribbling_expert,
    "SSLPassEndurance-v0": lambda env: pass_endurance_expert,
    "SSLStaticDefenders-v0": lambda env: (
        lambda state: static_defenders_expert(state, field=env.field)
    ),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="SSLDribbling-v0")
    p.add_argument("--envs", type=int, default=512)
    p.add_argument("--steps", type=int, default=512)
    p.add_argument(
        "--curriculum", type=int, default=1,
        help="collect from curriculum resets (state diversity); eval stays "
        "reference-exact",
    )
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--minibatch", type=int, default=4096)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--save", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--dagger-iters", type=int, default=0,
        help="DAgger rounds: roll the CLONED policy, label with the expert, "
        "refit on the aggregate — fixes the distribution shift that makes "
        "pure BC fail on tight-clearance courses",
    )
    p.add_argument("--eval-steps", type=int, default=0,
                   help="if >0, deterministic eval on the reference env after")
    p.add_argument(
        "--target", default="ppo", choices=["ppo", "sac"],
        help="ppo: fit the ActorCritic mean head (checkpoint for "
        "train_ppo_vss.py --init).  sac: fit the SquashedGaussianActor in "
        "atanh (pre-squash) space — tanh(mean) == expert action — and "
        "write an {actor_params} checkpoint for train_sac_vss.py --init; "
        "obs enter the SAC nets raw (no normaliser), matching training",
    )
    args = p.parse_args()

    env = rsoccer_tpu.make(args.env_id, curriculum=bool(args.curriculum))
    expert = EXPERTS[args.env_id](env)
    benv = BatchedEnv(env, args.envs)
    expert_v = jax.vmap(expert, in_axes=-1, out_axes=-1)

    if args.target == "sac":
        from rsoccer_tpu.models.sac import SquashedGaussianActor

        net = SquashedGaussianActor(action_size=benv.action_size)
    else:
        net = ActorCritic(action_size=benv.action_size)
    tx = optax.adam(args.lr)

    # ---- collect ---------------------------------------------------------
    # behavior="expert": roll the expert.  behavior="policy": roll the
    # current cloned policy (deterministic mean) but LABEL every state with
    # the expert's action — the DAgger aggregation that covers the states
    # the clone actually visits.
    def make_collect(behavior):
        def collect(key, params, obs_norm):
            k_reset, k_steps = jax.random.split(key)
            state, obs = benv.reset(k_reset)

            def one(carry, k):
                state, obs = carry
                label = expert_v(state)  # (A, B)
                if behavior == "expert":
                    act = label
                elif args.target == "sac":
                    mean, _ = net.apply(params, obs.T)
                    act = jnp.tanh(mean).T
                else:
                    mean, _, _ = net.apply(params, obs_norm.normalize(obs.T))
                    act = jnp.clip(mean.T, -1.0, 1.0)
                ns, nobs, reward, term, trunc, info = benv.step(state, act, k)
                return (ns, nobs), (obs, label)

            keys = jax.random.split(k_steps, args.steps)
            _, (obs_t, act_t) = jax.lax.scan(one, (state, obs), keys)
            # (T, O, B) -> (T*B, O)
            X = obs_t.transpose(0, 2, 1).reshape(-1, benv.obs_size)
            Y = act_t.transpose(0, 2, 1).reshape(-1, benv.action_size)
            return X, Y

        return collect

    collect_expert = jax.jit(make_collect("expert"))
    collect_policy = jax.jit(make_collect("policy"))

    def fit(params, Xn, Y, key):
        n = Xn.shape[0]
        opt_state = tx.init(params)

        def loss_fn(params, x, y):
            mean = net.apply(params, x)[0]
            return jnp.mean((mean - y) ** 2)

        def train_epoch(carry, ek):
            params, opt_state = carry
            perm = jax.random.permutation(ek, n)
            nb = n // args.minibatch
            idxs = perm[: nb * args.minibatch].reshape(nb, args.minibatch)

            def mb(carry, idx):
                params, opt_state = carry
                l, grads = jax.value_and_grad(loss_fn)(params, Xn[idx], Y[idx])
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), l

            (params, opt_state), ls = jax.lax.scan(mb, (params, opt_state), idxs)
            return (params, opt_state), ls.mean()

        eks = jax.random.split(key, args.epochs)
        (params, _), ls = jax.lax.scan(train_epoch, (params, opt_state), eks)
        return params, ls

    fit = jax.jit(fit)

    t0 = time.perf_counter()
    dummy = ObsNorm.init(benv.obs_size)
    params = net.init(jax.random.PRNGKey(args.seed + 1),
                      jnp.zeros((1, benv.obs_size)))
    X, Y = collect_expert(jax.random.PRNGKey(args.seed), params, dummy)
    X.block_until_ready()
    print(f"collected {X.shape[0]} expert pairs in {time.perf_counter() - t0:.1f}s")

    if args.target == "sac":
        # SAC nets see raw obs at training time; fit them the same way,
        # and regress the PRE-squash mean so tanh(mean) == expert action
        obs_norm = ObsNorm.init(benv.obs_size)  # identity
        Y = jnp.arctanh(jnp.clip(Y, -0.999, 0.999))
    else:
        # normaliser comes from the expert distribution and stays fixed
        # across DAgger rounds (it ships with the checkpoint)
        obs_norm = ObsNorm.init(benv.obs_size).update(X)

    params, ls = fit(params, obs_norm.normalize(X), Y,
                     jax.random.PRNGKey(args.seed + 2))
    print("bc mse per epoch:", [round(float(v), 5) for v in ls[:: max(1, args.epochs // 8)]])

    for it in range(args.dagger_iters):
        Xi, Yi = collect_policy(
            jax.random.PRNGKey(args.seed + 100 + it), params, obs_norm
        )
        if args.target == "sac":
            Yi = jnp.arctanh(jnp.clip(Yi, -0.999, 0.999))
        X = jnp.concatenate([X, Xi])
        Y = jnp.concatenate([Y, Yi])
        params, ls = fit(params, obs_norm.normalize(X), Y,
                         jax.random.PRNGKey(args.seed + 200 + it))
        print(f"dagger {it}: {X.shape[0]} pairs, final mse {float(ls[-1]):.5f}")

    # set the policy std from the clone's residuals: the std params are
    # untouched by the MSE fit (zero grad) and would stay at init — std 1.0
    # of exploration noise on a precision task wrecks the clone the moment
    # RL rolls it (measured: 96.8% -> 54.4% after a 300-update fine-tune).
    # Floor at 0.1 so fine-tuning still explores.
    mean = net.apply(params, obs_norm.normalize(X))[0]
    resid = jnp.sqrt(jnp.mean((mean - Y) ** 2, axis=0))
    log_std = jnp.log(jnp.clip(resid, 0.1, 1.0))
    if args.target == "sac":
        # the SAC log_std head is state-dependent (a Dense layer): zero its
        # kernel and set its bias so every state starts at the residual std
        def _set(path, v):
            keys = [getattr(pp, "key", getattr(pp, "name", "")) for pp in path]
            if "log_std" in keys:
                return jnp.zeros_like(v) if v.ndim == 2 else log_std
            return v

        params = jax.tree_util.tree_map_with_path(_set, params)
    else:
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: log_std if p[-1].key == "log_std" else v, params
        )
    print("bc residual std per action dim:", [round(float(v), 4) for v in resid])

    if args.target == "sac":
        checkpoint.save(args.save, {"actor_params": params})
        print(f"saved SAC actor_params to {args.save}")
    else:
        checkpoint.save(args.save, {"params": params, "obs_norm": obs_norm})
        print(f"saved params+obs_norm to {args.save}")

    # ---- optional deterministic eval on the reference-exact env ----------
    if args.eval_steps:
        from rsoccer_tpu.eval import make_eval_fn, success_criterion

        ref_env = rsoccer_tpu.make(args.env_id)
        ref_benv = BatchedEnv(ref_env, 256)
        if args.target == "sac":
            def policy(key, obs):
                mean = net.apply(params, obs.T)[0]
                return jnp.tanh(mean).T
        else:
            policy = PPOTrainer(ref_benv).make_policy(
                params, obs_norm=obs_norm, deterministic=True
            )
        ev = jax.jit(make_eval_fn(
            ref_benv, args.eval_steps, policy, success_criterion(args.env_id)
        ))
        ms = ev(jax.random.PRNGKey(9))
        print(
            f"BC policy eval: episodes={int(ms.episodes)} "
            f"success_rate={float(ms.success_rate):.3f} "
            f"mean_return={float(ms.mean_episode_return):.3f}"
        )


if __name__ == "__main__":
    main()
