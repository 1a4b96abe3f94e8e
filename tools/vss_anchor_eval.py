"""Absolute VSS-v0 anchor numbers for a policy: goal rate AND goal diff.

The self-play league reports only relative strength (vs frozen selves);
this tool anchors any {params, obs_norm} checkpoint on the reference's
own opponent distribution — OU-driven robots (vss_gym.py:127-140) — and
prints blue goals, yellow goals, truncations and per-episode goal diff.

    python tools/vss_anchor_eval.py --env-id VSS-v0 \
        --params artifacts/vss_ppo.ckpt --envs 1024 --steps 4800
    python tools/vss_anchor_eval.py --env-id VSSMultiAgent-v0 \
        --params artifacts/selfplay_vss_r3.ckpt ...   # league policy, 3 blues
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rsoccer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import rsoccer_tpu
from rsoccer_tpu.batch.vecenv import BatchedEnv
from rsoccer_tpu.models.ppo import PPOTrainer
from rsoccer_tpu.utils import checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="VSS-v0")
    p.add_argument("--params", required=True)
    p.add_argument("--envs", type=int, default=1024)
    p.add_argument("--steps", type=int, default=4800)
    p.add_argument("--hidden", default="256,256")
    args = p.parse_args()

    env = rsoccer_tpu.make(args.env_id)
    benv = BatchedEnv(env, args.envs)
    from rsoccer_tpu.models.ppo import PPOConfig

    trainer = PPOTrainer(
        benv,
        PPOConfig(hidden=tuple(int(h) for h in args.hidden.split(","))),
    )
    init = trainer.init(jax.random.PRNGKey(0))
    like = {"params": init.params, "obs_norm": init.obs_norm}
    ck = jax.tree.map(jnp.asarray, checkpoint.restore(args.params, like=like))
    policy = trainer.make_policy(
        ck["params"], ck["obs_norm"], deterministic=True
    )

    def body(carry, key):
        st, obs = carry
        act = policy(key, obs)
        st, obs, reward, term, trunc, info = benv.step(st, act, key)
        done = (term | trunc).astype(jnp.float32)
        out = (
            done.sum(),
            (done * info["goals_blue"]).sum(),
            (done * info["goals_yellow"]).sum(),
            (trunc.astype(jnp.float32) * done).sum(),
        )
        return (st, obs), out

    @jax.jit
    def run(key):
        kr, ks = jax.random.split(key)
        st, obs = benv.reset(kr)
        keys = jax.random.split(ks, args.steps)
        _, (eps, gb, gy, tr) = jax.lax.scan(body, (st, obs), keys)
        return eps.sum(), gb.sum(), gy.sum(), tr.sum()

    eps, gb, gy, tr = map(float, run(jax.random.PRNGKey(123)))
    out = {
        "env_id": args.env_id,
        "params": args.params,
        "episodes": int(eps),
        "blue_goal_rate": gb / max(eps, 1),
        "yellow_goal_rate": gy / max(eps, 1),
        "truncation_rate": tr / max(eps, 1),
        "mean_goal_diff": (gb - gy) / max(eps, 1),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
