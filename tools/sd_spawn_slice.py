"""Slice SSLStaticDefenders eval success by SPAWN class, fully on-device.

The ~87% PPO plateau concentrates its losses in specific spawn classes
(docs/training.md): contested spawns (a defender within 0.3 m of the ball)
and right-end-line balls (tight angles beside the forbidden GK area).  This
tool reproduces that analysis as one jitted scan: every finished episode is
binned by (a) its spawn's nearest defender-to-ball distance and (b) its
spawn ball x, and per-bin goal rates are printed as JSON.

    python tools/sd_spawn_slice.py --params artifacts/sd_ppo3.ckpt \
        --envs 1024 --steps 2000 [--env-kwargs '{"curriculum": true}']
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

D_EDGES = (0.3, 0.6, 1.0, 2.0)  # nearest-defender-to-ball bins (m)
X_EDGES = (1.0, 2.0, 3.0, 4.0)  # spawn ball x bins (m); half_len = 4.5


def _spawn_features(state):
    """(nearest defender-to-ball distance, ball x) from a structured state."""
    bx, by = state.world.ball.x, state.world.ball.y
    yx, yy = state.world.robots.x[1:], state.world.robots.y[1:]
    d = jnp.sqrt((yx - bx[None]) ** 2 + (yy - by[None]) ** 2).min(axis=0)
    return d, bx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--params", required=True)
    p.add_argument("--envs", type=int, default=1024)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--hidden", default="256,256")
    p.add_argument("--env-kwargs", default="{}")
    args = p.parse_args()

    env = rsoccer_tpu.make(
        "SSLStaticDefenders-v0", **json.loads(args.env_kwargs)
    )
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

    d_edges = jnp.asarray(D_EDGES)
    x_edges = jnp.asarray(X_EDGES)

    # termination-mode indicators, per-episode accumulators in the info
    # dict (envs/ssl_static_defenders._SHAPING_KEYS)
    modes = (
        "goal", "rbt_in_gk_area", "done_ball_out",
        "done_ball_out_right", "done_rbt_out",
    )

    def body(carry, key):
        st, obs, sd, sbx = carry
        act = policy(key, obs)
        st, obs, reward, term, trunc, info = benv.step(st, act, key)
        done = (term | trunc).astype(jnp.float32)
        succ = done * (reward > 4.0)
        db = jnp.searchsorted(d_edges, sd)  # (B,) bin ids 0..4
        xb = jnp.searchsorted(x_edges, sbx)
        oh_d = jax.nn.one_hot(db, 5) * done[:, None]
        oh_x = jax.nn.one_hot(xb, 5) * done[:, None]
        mode_rows = jnp.stack([info[m] for m in modes])  # (5, B)
        out = (
            oh_d.sum(0), (oh_d * succ[:, None]).sum(0),
            oh_x.sum(0), (oh_x * succ[:, None]).sum(0),
            # per-dist-bin termination-mode counts: (modes, bins)
            (mode_rows * done[None]) @ oh_d,
        )
        nd, nx = _spawn_features(st)  # post-reset state on done lanes
        sd = jnp.where(done > 0.5, nd, sd)
        sbx = jnp.where(done > 0.5, nx, sbx)
        return (st, obs, sd, sbx), out

    @jax.jit
    def run(key):
        kr, ks = jax.random.split(key)
        st, obs = benv.reset(kr)
        sd, sbx = _spawn_features(st)
        keys = jax.random.split(ks, args.steps)
        _, (dc, ds, xc, xs, mc) = jax.lax.scan(body, (st, obs, sd, sbx), keys)
        return dc.sum(0), ds.sum(0), xc.sum(0), xs.sum(0), mc.sum(0)

    dc, ds, xc, xs, mc = map(
        lambda a: a.tolist(), run(jax.random.PRNGKey(42))
    )
    labels_d = ["<0.3", "0.3-0.6", "0.6-1.0", "1.0-2.0", ">=2.0"]
    labels_x = ["0.2-1", "1-2", "2-3", "3-4", "4-4.4"]
    out = {
        "episodes": int(sum(dc)),
        "goal_rate": sum(ds) / max(sum(dc), 1),
        "by_defender_dist": {
            l: {"episodes": int(c), "goal_rate": s / max(c, 1)}
            for l, c, s in zip(labels_d, dc, ds)
        },
        "by_ball_x": {
            l: {"episodes": int(c), "goal_rate": s / max(c, 1)}
            for l, c, s in zip(labels_x, xc, xs)
        },
        "termination_modes_by_defender_dist": {
            m: {l: int(mc[i][j]) for j, l in enumerate(labels_d)}
            for i, m in enumerate(modes)
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
