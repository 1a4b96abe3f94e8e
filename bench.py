"""Benchmark: VSS-v0 env-steps/s at 8192 parallel envs (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 10M — the north-star throughput for one host
(BASELINE.md; the reference publishes no numbers of its own: it steps one
C++ sim per env from Python and cannot batch at all).

Env overrides: RSOCCER_BENCH_ENVS, RSOCCER_BENCH_STEPS, RSOCCER_BENCH_ENV_ID.
"""

import json
import os
import sys
import time

import jax

# persistent compilation cache: repeated bench runs (and driver re-runs)
# skip the multi-minute remote compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    n_envs = int(os.environ.get("RSOCCER_BENCH_ENVS", 8192))
    n_steps = int(os.environ.get("RSOCCER_BENCH_STEPS", 100))
    n_iters = int(os.environ.get("RSOCCER_BENCH_ITERS", 5))
    # unroll 16 amortises the scan-body overhead (policy draw, metric
    # reductions, carry updates) to ~zero: measured 234M -> 254M steps/s
    # at the 8192 metric point vs unroll 4; >=32 gains <2% more but
    # multiplies the (remote) compile time
    unroll = int(os.environ.get("RSOCCER_BENCH_UNROLL", 16))
    env_id = os.environ.get("RSOCCER_BENCH_ENV_ID", "VSS-v0")

    import rsoccer_tpu
    from rsoccer_tpu.batch import rollout as R
    from rsoccer_tpu.batch.vecenv import BatchedEnv

    # RSOCCER_BENCH_PALLAS: 0 = plain XLA path, 1 = pallas physics kernel,
    # full = full-step pallas kernel (state resident in kernel layout),
    # full-krng = full-step kernel with in-kernel hardware RNG.
    # Default on TPU: full-krng (the fastest path: 151.9M vs 74.6M XLA at
    # the 8192 metric point, monotone to 177.7M at 131072).  On CPU the
    # kernels only run in interpret mode, so default to the XLA path.
    default_mode = "full-krng" if jax.default_backend() == "tpu" else "0"
    pallas_mode = os.environ.get("RSOCCER_BENCH_PALLAS", default_mode)
    env = rsoccer_tpu.make(env_id)
    benv = BatchedEnv(
        env,
        n_envs,
        pallas_physics=pallas_mode == "1",
        pallas_full=pallas_mode.startswith("full"),
        pallas_rng="kernel" if pallas_mode == "full-krng" else "input",
    )
    # modest scan length + repeated calls: same measured steady-state
    # throughput as one long scan, but a far smaller program to compile
    # (matters on remote-compile TPU setups)
    roll = jax.jit(
        R.make_rollout_fn(benv, n_steps, unroll=unroll), donate_argnums=0
    )

    # hardware RNG (rbg) by default: env noise is drawn batch-level, so the
    # key impl only changes which generator fills the noise blocks
    rng_impl = os.environ.get("RSOCCER_BENCH_RNG", "rbg")
    carry = R.init_carry(benv, jax.random.key(0, impl=rng_impl))
    # warmup / compile.  Synchronise via an actual scalar fetch, not
    # block_until_ready: some PJRT transports (e.g. tunneled remote TPUs)
    # report readiness before execution completes, and only a
    # device-to-host transfer truly waits.
    carry, ms = roll(carry)
    float(ms.total_reward)
    # second warmup: the first call's outputs can differ in weak-typing from
    # the initial carry, making the next call a retrace; stabilise so the
    # timed window can never include a (multi-minute, remote) recompile
    carry, ms = roll(carry)
    float(ms.total_reward)

    # adaptive: grow the iteration count until the measured window is long
    # enough that fixed dispatch/transfer latency is noise (<2% at >=2s)
    while True:
        t0 = time.perf_counter()
        for _ in range(n_iters):
            carry, ms = roll(carry)
        float(ms.total_reward)
        dt = time.perf_counter() - t0
        if dt >= 2.0 or n_iters >= 2000:
            break
        n_iters = min(2000, max(n_iters * 2, int(n_iters * 2.5 / max(dt, 1e-3))))
    n_steps = n_steps * n_iters

    steps_per_s = n_envs * n_steps / dt
    print(
        json.dumps(
            {
                "metric": f"env-steps/s @ {n_envs} parallel {env_id} envs "
                f"({jax.devices()[0].platform})",
                "value": round(steps_per_s),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / 1e7, 4),
            }
        )
    )
    # context for humans, on stderr so the JSON line stays clean
    print(
        f"# {n_steps} steps x {n_envs} envs in {dt:.3f}s; last-iter "
        f"episodes={int(ms.episodes)} total_reward={float(ms.total_reward):.1f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
