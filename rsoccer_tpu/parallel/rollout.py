"""Sharded rollouts over a device mesh.

The batched rollout (``rsoccer_tpu.batch.rollout``) is already a pure
function of lane-layout pytrees; scaling it across chips is just sharding the
env batch axis over the mesh and letting XLA partition the program — the
physics/task step has no cross-env data flow, so the partitioned program has
zero collectives in the hot loop (metric sums reduce at the end).
"""

from __future__ import annotations

import jax

from rsoccer_tpu.batch.rollout import RolloutCarry, init_carry, make_rollout_fn
from rsoccer_tpu.batch.vecenv import BatchedEnv
from rsoccer_tpu.parallel.mesh import Mesh, shard_batched_tree


def shard_carry(carry: RolloutCarry, mesh: Mesh) -> RolloutCarry:
    """Place a rollout carry on the mesh: batched leaves batch-last, the
    two scalar RNG keys replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    return RolloutCarry(
        state=shard_batched_tree(carry.state, mesh, batch_axis=-1),
        obs=shard_batched_tree(carry.obs, mesh, batch_axis=-1),
        key=jax.device_put(carry.key, replicated),
        pol_key=jax.device_put(carry.pol_key, replicated),
        ep_return=shard_batched_tree(carry.ep_return, mesh, batch_axis=-1),
        ep_length=shard_batched_tree(carry.ep_length, mesh, batch_axis=-1),
    )


def make_sharded_rollout(
    benv: BatchedEnv,
    mesh: Mesh,
    n_steps: int,
    policy=None,
    unroll: int = 4,
):
    """Build (jitted, donated) rollout + an init helper, both mesh-sharded.

    ``benv.n_envs`` must be divisible by the mesh size.
    """
    n_dev = mesh.devices.size
    if benv.n_envs % n_dev:
        raise ValueError(
            f"n_envs={benv.n_envs} not divisible by mesh size {n_dev}"
        )
    rollout = make_rollout_fn(benv, n_steps, policy=policy, unroll=unroll)
    rollout_jit = jax.jit(rollout, donate_argnums=0)

    def init(key) -> RolloutCarry:
        return shard_carry(init_carry(benv, key), mesh)

    return rollout_jit, init
