"""Roofline / MFU accounting for one jitted train step (PPO or SAC).

Captures a device trace of the chained train step and aggregates the
per-op metadata XLA attaches to every event — ``hlo_category``,
``model_flops``, ``bytes_accessed``, ``device_duration_ps`` — into:

- device time per HLO op class (convolution/matmul, loop fusion, copy, ...)
- achieved model FLOP/s vs the chip's peak -> MFU %
- achieved HBM bytes/s vs peak bandwidth -> BW residency %
- the top ops by device time, with their HLO long names

This answers "how far is the update phase from the MXU roofline, and what
bound sets the ceiling" with measured numbers instead of guesses.

    python tools/roofline.py --learner ppo --envs 4096 --chain 50 \
        --pallas-full --pallas-rng kernel --num-epochs 2 \
        --minibatch-mode time --rollout-unroll 4
    python tools/roofline.py --learner sac --envs 512 --chain 200

Peak numbers default to TPU v5e (bf16 197 TFLOP/s, f32 ~49 TFLOP/s via
MXU, HBM 819 GB/s); override with --peak-tflops / --peak-gbs for other
chips.
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
import jax.numpy as jnp


def build_step(args):
    import rsoccer_tpu
    from rsoccer_tpu.batch.vecenv import BatchedEnv

    env = rsoccer_tpu.make(args.env_id)
    benv = BatchedEnv(
        env, args.envs,
        pallas_full=args.pallas_full, pallas_rng=args.pallas_rng,
    )
    if args.learner == "ppo":
        from rsoccer_tpu.models.ppo import PPOConfig, PPOTrainer

        trainer = PPOTrainer(
            benv,
            PPOConfig(
                rollout_steps=args.rollout_steps,
                minibatch_mode=args.minibatch_mode,
                num_minibatches=args.num_minibatches,
                num_epochs=args.num_epochs,
                rollout_unroll=args.rollout_unroll,
            ),
        )
        steps_per_iter = args.rollout_steps * args.envs
    else:
        from rsoccer_tpu.models.sac import SACConfig, SACTrainer

        trainer = SACTrainer(
            benv,
            SACConfig(
                batch_size=args.batch_size, warmup_steps=50,
                grad_steps_per_iter=2, n_step=args.n_step,
                reward_scale=10.0,
            ),
        )
        steps_per_iter = args.envs
    state = trainer.init(jax.random.PRNGKey(0))

    def chained(state, key):
        state, ms = jax.lax.scan(
            trainer.train_step, state, jax.random.split(key, args.chain)
        )
        return state, jax.tree.map(lambda m: m[-1], ms)

    return jax.jit(chained, donate_argnums=0), state, steps_per_iter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--learner", choices=["ppo", "sac"], default="ppo")
    p.add_argument("--env-id", default="SSLStaticDefenders-v0")
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--chain", type=int, default=50)
    p.add_argument("--rollout-steps", type=int, default=128)
    p.add_argument("--minibatch-mode", default="time")
    p.add_argument("--num-minibatches", type=int, default=8)
    p.add_argument("--num-epochs", type=int, default=2)
    p.add_argument("--rollout-unroll", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=512)  # sac
    p.add_argument("--n-step", type=int, default=8)  # sac
    p.add_argument("--pallas-full", action="store_true")
    p.add_argument("--pallas-rng", default="input", choices=["input", "kernel"])
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="chip peak dense TFLOP/s at the compute dtype "
                   "(v5e bf16: 197; v5e f32 via MXU: ~49)")
    p.add_argument("--peak-gbs", type=float, default=819.0,
                   help="chip peak HBM GB/s (v5e: 819)")
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--out", default="/tmp/rsoccer_roofline_trace")
    p.add_argument("--json", default="", help="also write the summary here")
    args = p.parse_args()

    from rsoccer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    step, state, steps_per_iter = build_step(args)
    state, ms = step(state, jax.random.PRNGKey(1))
    jax.block_until_ready(state)
    state, ms = step(state, jax.random.PRNGKey(2))
    jax.block_until_ready(state)

    jax.profiler.start_trace(args.out)
    state, ms = step(state, jax.random.PRNGKey(99))
    jax.block_until_ready(state)
    jax.profiler.stop_trace()

    paths = glob.glob(
        os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True
    )
    latest = max(paths, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)

    # device events are the ones carrying per-op HLO metadata; container
    # ops (while/conditional/call) span their children and would double
    # count, so only leaf ops aggregate
    _CONTAINERS = {"while", "conditional", "call"}
    evs = [
        e for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and isinstance(e.get("args"), dict)
        and "hlo_category" in e["args"]
        and e["args"]["hlo_category"] not in _CONTAINERS
    ]
    total_dur = 0.0
    by_cat = defaultdict(lambda: [0.0, 0.0, 0.0])  # dur_us, flops, bytes
    by_op = defaultdict(lambda: [0.0, 0.0, 0.0, ""])
    for e in evs:
        a = e["args"]
        dur = float(a.get("device_duration_ps", 0)) / 1e6  # ps -> us
        fl = float(a.get("model_flops", 0) or 0)
        byt = float(a.get("raw_bytes_accessed", a.get("bytes_accessed", 0)) or 0)
        total_dur += dur
        cat = a["hlo_category"]
        by_cat[cat][0] += dur
        by_cat[cat][1] += fl
        by_cat[cat][2] += byt
        o = by_op[e["name"]]
        o[0] += dur
        o[1] += fl
        o[2] += byt
        o[3] = a.get("long_name", "")[:160]

    total_s = total_dur / 1e6
    flops = sum(v[1] for v in by_cat.values())
    bytes_ = sum(v[2] for v in by_cat.values())
    iters = args.chain
    print(
        f"device busy: {total_dur/1e3:.2f} ms for {iters} iters "
        f"({total_dur/iters:.0f} us/iter; "
        f"{steps_per_iter*iters/total_s/1e6:.1f}M env-steps/s device rate)"
    )
    print(
        f"model FLOPs: {flops/1e9:.2f} GFLOP -> "
        f"{flops/total_s/1e12:.2f} TFLOP/s achieved = "
        f"{100*flops/total_s/1e12/args.peak_tflops:.1f}% MFU "
        f"(peak {args.peak_tflops:.0f} TF/s)"
    )
    print(
        f"HBM traffic: {bytes_/1e9:.2f} GB -> "
        f"{bytes_/total_s/1e9:.0f} GB/s = "
        f"{100*bytes_/total_s/1e9/args.peak_gbs:.1f}% of {args.peak_gbs:.0f} GB/s"
    )
    print("\nby HLO category:")
    print(f"{'category':28s} {'ms':>9s} {'%time':>6s} {'GFLOP':>9s} {'GB':>8s}")
    rows = sorted(by_cat.items(), key=lambda kv: -kv[1][0])
    for cat, (dur, fl, byt) in rows:
        print(
            f"{cat:28s} {dur/1e3:9.2f} {100*dur/total_dur:6.1f} "
            f"{fl/1e9:9.2f} {byt/1e9:8.2f}"
        )
    print(f"\ntop {args.top} ops by device time:")
    for name, (dur, fl, byt, ln) in sorted(
        by_op.items(), key=lambda kv: -kv[1][0]
    )[: args.top]:
        print(f"{dur/1e3:9.2f} ms  {name:22s} {ln[:120]}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {
                    "learner": args.learner,
                    "envs": args.envs,
                    "chain": args.chain,
                    "us_per_iter": total_dur / iters,
                    "env_steps_per_s": steps_per_iter * iters / total_s,
                    "achieved_tflops": flops / total_s / 1e12,
                    "mfu_pct": 100 * flops / total_s / 1e12 / args.peak_tflops,
                    "achieved_gbs": bytes_ / total_s / 1e9,
                    "bw_pct": 100 * bytes_ / total_s / 1e9 / args.peak_gbs,
                    "by_category": {
                        c: {"ms": v[0] / 1e3, "gflop": v[1] / 1e9, "gb": v[2] / 1e9}
                        for c, v in by_cat.items()
                    },
                },
                f, indent=1,
            )
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
