"""Evaluate a trained policy: metrics + optional episode GIF.

    python examples/train_ppo_vss.py --envs 1024 --updates 50 --save /tmp/params
    python examples/eval_policy.py --params /tmp/params --gif /tmp/episode.gif
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rsoccer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import rsoccer_tpu
from rsoccer_tpu.batch import rollout as R
from rsoccer_tpu.batch.vecenv import BatchedEnv
from rsoccer_tpu.models.ppo import PPOTrainer
from rsoccer_tpu.utils import checkpoint
from rsoccer_tpu.utils.video import record_episode, save_gif


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="VSS-v0")
    p.add_argument("--envs", type=int, default=256)
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--params", default="")
    p.add_argument("--gif", default="")
    p.add_argument(
        "--hidden", default="256,256",
        help="actor/critic tower widths of the checkpoint (PPO)",
    )
    p.add_argument(
        "--algo", default="ppo", choices=["ppo", "sac"],
        help="checkpoint format: ppo = {params, obs_norm} "
        "(train_ppo_vss.py), sac = actor params (train_sac_vss.py)",
    )
    args = p.parse_args()

    env = rsoccer_tpu.make(args.env_id)
    benv = BatchedEnv(env, args.envs)

    if args.algo == "sac":
        from rsoccer_tpu.models.sac import SACTrainer

        trainer = SACTrainer(benv)
        init_state = trainer.init(jax.random.PRNGKey(0))
        actor_params = init_state.actor_params
        if args.params:
            actor_params = jax.tree.map(
                jax.numpy.asarray, checkpoint.restore(args.params, like=actor_params)
            )
        else:
            print("no --params given; evaluating a freshly initialised policy")
        policy = trainer.make_policy(actor_params, deterministic=True)
    else:
        from rsoccer_tpu.models.ppo import PPOConfig

        trainer = PPOTrainer(
            benv,
            PPOConfig(hidden=tuple(int(h) for h in args.hidden.split(","))),
        )
        init_state = trainer.init(jax.random.PRNGKey(0))
        if args.params:
            like = {"params": init_state.params, "obs_norm": init_state.obs_norm}
            ckpt = checkpoint.restore(args.params, like=like)
            ckpt = jax.tree.map(jax.numpy.asarray, ckpt)
            params, obs_norm = ckpt["params"], ckpt["obs_norm"]
        else:
            print("no --params given; evaluating a freshly initialised policy")
            params, obs_norm = init_state.params, init_state.obs_norm
        policy = trainer.make_policy(params, obs_norm=obs_norm, deterministic=True)
    from rsoccer_tpu.eval import make_eval_fn, success_criterion

    ev = jax.jit(
        make_eval_fn(benv, args.steps, policy, success_criterion(args.env_id))
    )
    ms = ev(jax.random.PRNGKey(1))
    print(
        f"{args.envs} envs x {args.steps} steps: "
        f"episodes={int(ms.episodes)} "
        f"success_rate={float(ms.success_rate):.3f} "
        f"mean_return={float(ms.mean_episode_return):.3f} "
        f"mean_length={float(ms.mean_episode_length):.1f}"
    )

    if args.gif:
        def single_policy(key, obs):
            return policy(key, obs[:, None])[:, 0]

        frames = record_episode(env, policy=single_policy, seed=2, max_steps=600)
        save_gif(frames, args.gif)
        print(f"wrote {args.gif} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
