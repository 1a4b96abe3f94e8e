"""Train a SAC agent on VSS-v0, fully on-device.

    python examples/train_sac_vss.py [--envs 256] [--iters 2000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rsoccer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import rsoccer_tpu
from rsoccer_tpu.batch.vecenv import BatchedEnv
from rsoccer_tpu.models.sac import SACConfig, SACTrainer
from rsoccer_tpu.utils import checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=256)
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--env-id", default="VSS-v0")
    p.add_argument("--save", default="")
    p.add_argument("--reward-scale", type=float, default=1.0)
    p.add_argument("--target-entropy-scale", type=float, default=1.0)
    args = p.parse_args()

    env = rsoccer_tpu.make(args.env_id)
    benv = BatchedEnv(env, args.envs)
    trainer = SACTrainer(
        benv,
        SACConfig(
            batch_size=512, warmup_steps=50, grad_steps_per_iter=2,
            reward_scale=args.reward_scale,
            target_entropy_scale=args.target_entropy_scale,
        ),
    )
    state = trainer.init(jax.random.PRNGKey(0))
    step = jax.jit(trainer.train_step, donate_argnums=0)

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(args.iters):
        key, k = jax.random.split(key)
        state, m = step(state, k)
        if i % max(1, args.iters // 10) == 0 or i == args.iters - 1:
            print(
                f"iter {i:5d}  reward/step {float(m['mean_reward']):+.4f}  "
                f"q_loss {float(m['q_loss']):.4f}  alpha {float(m['alpha']):.3f}"
            )
    steps = args.iters * args.envs * trainer.cfg.env_steps_per_iter
    print(f"{steps/1e6:.2f}M env-steps in {time.perf_counter()-t0:.0f}s")

    if args.save:
        checkpoint.save(args.save, state.actor_params)
        print(f"saved actor params to {args.save}")


if __name__ == "__main__":
    main()
