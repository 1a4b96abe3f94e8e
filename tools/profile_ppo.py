"""Profile one jitted PPO train step (rollout + GAE + minibatched updates).

Same trace-parsing approach as tools/profile_step.py, pointed at the
learner: prints the top on-device ops so update-phase bottlenecks
(random-index gathers, optimizer elementwise chains, matmul shares) are
attributable.

    python tools/profile_ppo.py [--envs 4096] [--env-id SSLStaticDefenders-v0]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--env-id", default="SSLStaticDefenders-v0")
    p.add_argument("--rollout-steps", type=int, default=128)
    p.add_argument("--minibatch-mode", default="shuffle")
    p.add_argument("--pallas-full", action="store_true")
    p.add_argument("--pallas-rng", default="input", choices=["input", "kernel"])
    p.add_argument("--hidden", default="256,256")
    p.add_argument("--num-minibatches", type=int, default=8)
    p.add_argument("--num-epochs", type=int, default=4)
    p.add_argument("--rollout-unroll", type=int, default=1)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument(
        "--chain", type=int, default=1,
        help="profile a lax.scan of K train steps per launch (the training "
        "scripts' --chain path) instead of a single step",
    )
    p.add_argument("--out", default="/tmp/rsoccer_ppo_trace")
    args = p.parse_args()

    from rsoccer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import rsoccer_tpu
    from rsoccer_tpu.batch.vecenv import BatchedEnv
    from rsoccer_tpu.models.ppo import PPOConfig, PPOTrainer

    env = rsoccer_tpu.make(args.env_id)
    benv = BatchedEnv(
        env, args.envs,
        pallas_full=args.pallas_full, pallas_rng=args.pallas_rng,
    )
    trainer = PPOTrainer(
        benv,
        PPOConfig(
            rollout_steps=args.rollout_steps,
            minibatch_mode=args.minibatch_mode,
            hidden=tuple(int(h) for h in args.hidden.split(",")),
            num_minibatches=args.num_minibatches,
            num_epochs=args.num_epochs,
            rollout_unroll=args.rollout_unroll,
        ),
    )
    state = trainer.init(jax.random.PRNGKey(0))
    if args.chain > 1:

        def chained(state, key):
            state, ms = jax.lax.scan(
                trainer.train_step, state, jax.random.split(key, args.chain)
            )
            return state, jax.tree.map(lambda m: m[-1], ms)

        step = jax.jit(chained, donate_argnums=0)
    else:
        step = jax.jit(trainer.train_step, donate_argnums=0)

    # scalar outputs can report ready before the launch fully retires on
    # tunneled runtimes — sync the WHOLE state tree for honest timing
    state, ms = step(state, jax.random.PRNGKey(1))
    jax.block_until_ready(state)
    state, ms = step(state, jax.random.PRNGKey(2))
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, ms = step(state, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / (args.iters * args.chain)
    steps_per = args.rollout_steps * args.envs
    print(
        f"{dt * 1e3:.1f} ms/update, {steps_per / dt / 1e6:.2f}M env-steps/s "
        f"({args.envs} envs x {args.rollout_steps} rollout steps, "
        f"chain {args.chain}, full-tree sync)"
    )

    jax.profiler.start_trace(args.out)
    state, ms = step(state, jax.random.PRNGKey(99))
    jax.block_until_ready(state)
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace written", file=sys.stderr)
        return
    latest = max(paths, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            by_name[ev.get("name", "?")] += ev["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:40]
    print(f"trace: {latest}")
    for name, dur in top:
        print(f"{dur/1e3:10.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
