"""Soft Actor-Critic with an on-device replay buffer.

Second algorithm family next to PPO (models/ppo.py): off-policy, suited to
the sparse-terminal SSL skill tasks.  Everything — env stepping, the
circular replay buffer, critic/actor/temperature updates, polyak targets —
lives in one jitted train step; the buffer is a pytree of preallocated
arrays so there is no host round-trip anywhere in the loop.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from rsoccer_tpu.batch.vecenv import BatchedEnv


class SACConfig(NamedTuple):
    buffer_size: int = 1 << 18
    batch_size: int = 256
    env_steps_per_iter: int = 1  # batched env steps per train iteration
    grad_steps_per_iter: int = 1
    gamma: float = 0.99
    tau: float = 0.005  # polyak rate
    lr: float = 3e-4
    compute_dtype: Any = jnp.float32  # actor/critic matmul dtype; bf16
    # doubles MXU throughput (mirrors networks.ActorCritic).  Params and
    # the Q/mean/log_std heads stay f32 either way.  Default f32 keeps
    # existing checkpoints' eval numerics bit-stable; flip per-run via
    # train_sac_vss.py --bf16.
    init_alpha: float = 0.1
    target_entropy_scale: float = 1.0  # target entropy = -scale * act_dim
    warmup_steps: int = 1000  # uniform-random actions before learning
    reward_scale: float = 1.0  # Q-target scale: lift tiny shaped rewards
    # above entropy-term noise (the standard SAC knob for tasks whose
    # per-step rewards are ~1e-2, e.g. the SSL shaping cascades)
    n_step: int = 1  # n-step Q targets.  Insertion is env-major with a
    # fixed stride (one batched step inserts all B envs contiguously), so
    # env b's NEXT transition sits exactly B slots later in the ring —
    # n-step chains are strided gathers, no sequence storage needed.
    # Chains stop at episode boundaries (terminated OR truncated) and
    # bootstrap from the last pre-boundary next_obs.  n_step=1 is exactly
    # classic SAC.  The standard fix for sparse terminal rewards (the
    # measured SAC failure mode on the SSL goal tasks — docs/training.md).


class SquashedGaussianActor(nn.Module):
    action_size: int
    hidden: tuple = (256, 256)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(self.compute_dtype)
        for i, h in enumerate(self.hidden):
            x = nn.relu(
                nn.Dense(h, name=f"fc{i}", dtype=self.compute_dtype)(x)
            )
        x = x.astype(jnp.float32)
        mean = nn.Dense(self.action_size, name="mean")(x)
        log_std = jnp.clip(nn.Dense(self.action_size, name="log_std")(x), -5.0, 2.0)
        return mean, log_std


class QCritic(nn.Module):
    hidden: tuple = (256, 256)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1).astype(self.compute_dtype)
        for i, h in enumerate(self.hidden):
            x = nn.relu(
                nn.Dense(h, name=f"fc{i}", dtype=self.compute_dtype)(x)
            )
        return nn.Dense(1, name="q")(x.astype(jnp.float32))[..., 0]


def sample_squashed(key, mean, log_std):
    std = jnp.exp(log_std)
    z = mean + std * jax.random.normal(key, mean.shape)
    a = jnp.tanh(z)
    # log-prob with tanh correction
    logp = jnp.sum(
        -0.5 * ((z - mean) / std) ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )
    logp = logp - jnp.sum(jnp.log(1.0 - a**2 + 1e-6), axis=-1)
    return a, logp


class Buffer(NamedTuple):
    obs: jnp.ndarray  # (C, O)
    action: jnp.ndarray  # (C, A)
    reward: jnp.ndarray  # (C,)
    next_obs: jnp.ndarray  # (C, O)
    done: jnp.ndarray  # (C,) terminated only (not truncation)
    boundary: jnp.ndarray  # (C,) episode end of ANY kind (term | trunc):
    # the next same-env slot starts a fresh episode, so n-step chains stop
    ptr: jnp.ndarray
    filled: jnp.ndarray

    @staticmethod
    def init(capacity, obs_size, action_size):
        return Buffer(
            obs=jnp.zeros((capacity, obs_size)),
            action=jnp.zeros((capacity, action_size)),
            reward=jnp.zeros((capacity,)),
            next_obs=jnp.zeros((capacity, obs_size)),
            done=jnp.zeros((capacity,)),
            boundary=jnp.zeros((capacity,)),
            ptr=jnp.zeros((), jnp.int32),
            filled=jnp.zeros((), jnp.int32),
        )

    def add_batch(self, obs, action, reward, next_obs, done, boundary):
        """Insert B transitions at the circular pointer (B must divide C)."""
        b = obs.shape[0]
        c = self.obs.shape[0]
        idx = (self.ptr + jnp.arange(b)) % c
        return self._replace(
            obs=self.obs.at[idx].set(obs),
            action=self.action.at[idx].set(action),
            reward=self.reward.at[idx].set(reward),
            next_obs=self.next_obs.at[idx].set(next_obs),
            done=self.done.at[idx].set(done),
            boundary=self.boundary.at[idx].set(boundary),
            ptr=(self.ptr + b) % c,
            filled=jnp.minimum(self.filled + b, c),
        )

    def sample(self, key, batch_size):
        idx = jax.random.randint(
            key, (batch_size,), 0, jnp.maximum(self.filled, 1)
        )
        take = lambda arr: arr[idx]
        return (
            take(self.obs), take(self.action), take(self.reward),
            take(self.next_obs), take(self.done),
        )

    def sample_nstep(self, key, batch_size, stride, n_step, gamma):
        """Sample n-step transitions: ``(obs, action, G, boot_obs,
        boot_disc)`` with ``G = sum_k gamma^k r_k`` up to the first episode
        boundary (inclusive) or ``n_step`` transitions, and ``boot_disc =
        gamma^m * (1 - done_last)`` the bootstrap coefficient for
        ``boot_obs`` (the last chained next_obs).  ``stride`` is the
        insertion batch width B: env b's successor transition lives exactly
        B slots later in the ring.  Chains are drawn only from the window
        where all ``n_step`` links are stored (offset < filled - (n-1)*B
        from the OLDEST element), so they never straddle the write head.
        Reduces exactly to :meth:`sample` semantics at ``n_step=1``."""
        c = self.obs.shape[0]
        span = (n_step - 1) * stride
        valid = jnp.maximum(self.filled - span, 1)
        start = jnp.mod(self.ptr - self.filled, c)  # oldest element
        off = jax.random.randint(key, (batch_size,), 0, valid)
        base = jnp.mod(start + off, c)

        g = jnp.zeros((batch_size,))
        alive = jnp.ones((batch_size,))
        boot_obs = jnp.zeros((batch_size, self.obs.shape[1]))
        boot_disc = jnp.zeros((batch_size,))
        for k in range(n_step):
            pos = jnp.mod(base + k * stride, c)
            r_k = self.reward[pos]
            b_k = self.boundary[pos]
            d_k = self.done[pos]
            g = g + alive * (gamma**k) * r_k
            # chain ends here if the episode ended, we ran out of steps, or
            # the next link isn't stored yet (early filling, when the
            # valid-window clamp above cannot exclude short chains — the
            # chain then truncates here and bootstraps from THIS next_obs
            # instead of reading unwritten slots)
            next_unwritten = (
                jnp.zeros((batch_size,), bool)
                if k == n_step - 1
                else (off + (k + 1) * stride) >= self.filled
            )
            is_last = alive * jnp.where(
                (b_k > 0.0) | (k == n_step - 1) | next_unwritten, 1.0, 0.0
            )
            boot_obs = jnp.where(
                is_last[:, None] > 0.0, self.next_obs[pos], boot_obs
            )
            boot_disc = jnp.where(
                is_last > 0.0, (gamma ** (k + 1)) * (1.0 - d_k), boot_disc
            )
            alive = alive * (1.0 - jnp.maximum(b_k, next_unwritten))
        return self.obs[base], self.action[base], g, boot_obs, boot_disc


class SACState(NamedTuple):
    actor_params: Any
    q1_params: Any
    q2_params: Any
    q1_target: Any
    q2_target: Any
    log_alpha: jnp.ndarray
    opt_actor: optax.OptState
    opt_q1: optax.OptState
    opt_q2: optax.OptState
    opt_alpha: optax.OptState
    buffer: Buffer
    env_state: Any
    obs: jnp.ndarray  # (O, B)
    env_key: jnp.ndarray
    total_steps: jnp.ndarray


class SACTrainer:
    def __init__(
        self,
        benv: BatchedEnv,
        config: SACConfig = SACConfig(),
        axis_name: str | None = None,
    ):
        """``axis_name``: mesh axis to ``pmean`` gradients over.  Set when
        this trainer runs INSIDE ``shard_map`` as the per-device half of a
        data-parallel step (parallel/sac.py): each device computes grads on
        its local replay minibatch, the pmean makes the applied update the
        gradient of the global-batch mean, so replicated params stay
        bit-identical across devices.  None (default) = single-device."""
        self.benv = benv
        self.cfg = config
        self.axis_name = axis_name
        self.actor = SquashedGaussianActor(
            action_size=benv.action_size, compute_dtype=config.compute_dtype
        )
        self.q = QCritic(compute_dtype=config.compute_dtype)
        self.tx = optax.adam(config.lr)
        self.target_entropy = -config.target_entropy_scale * benv.action_size
        # sample_nstep walks n_step strided links of stride n_envs through
        # the ring; with buffer_size <= (n_step-1)*n_envs the valid window
        # clamps to 1 and every sampled element collapses to the single
        # oldest transition — silent degradation, so reject outright
        if config.buffer_size < config.n_step * benv.n_envs:
            raise ValueError(
                f"buffer_size ({config.buffer_size}) must be >= "
                f"n_step * n_envs ({config.n_step} * {benv.n_envs} = "
                f"{config.n_step * benv.n_envs}) for strided n-step chains"
            )

    def init(self, key) -> SACState:
        ka, k1, k2, kenv, kkey = jax.random.split(key, 5)
        obs_d = jnp.zeros((1, self.benv.obs_size))
        act_d = jnp.zeros((1, self.benv.action_size))
        actor_params = self.actor.init(ka, obs_d)
        q1 = self.q.init(k1, obs_d, act_d)
        q2 = self.q.init(k2, obs_d, act_d)
        env_state, obs = self.benv.reset(kenv)
        log_alpha = jnp.log(jnp.asarray(self.cfg.init_alpha))
        copy = lambda t: jax.tree.map(jnp.copy, t)
        return SACState(
            actor_params=actor_params,
            q1_params=q1, q2_params=q2,
            # distinct buffers: aliasing the live critics would make donated
            # train steps hand the same buffer to Execute() twice
            q1_target=copy(q1), q2_target=copy(q2),
            log_alpha=log_alpha,
            opt_actor=self.tx.init(actor_params),
            opt_q1=self.tx.init(q1), opt_q2=self.tx.init(q2),
            opt_alpha=self.tx.init(log_alpha),
            buffer=Buffer.init(
                self.cfg.buffer_size, self.benv.obs_size, self.benv.action_size
            ),
            env_state=env_state,
            obs=obs,
            env_key=kkey,
            total_steps=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _collect(self, state: SACState, key):
        k_act, k_env = jax.random.split(key)
        obs_bf = state.obs.T  # (B, O)
        mean, log_std = self.actor.apply(state.actor_params, obs_bf)
        a_pol, _ = sample_squashed(k_act, mean, log_std)
        a_rand = jax.random.uniform(
            k_act, a_pol.shape, minval=-1.0, maxval=1.0
        )
        action = jnp.where(
            state.total_steps < self.cfg.warmup_steps, a_rand, a_pol
        )
        # true successor obs (pre-reset on episode ends): the replay must
        # bootstrap truncated transitions from the FINAL obs of the
        # episode, not the next episode's spawn.  Works on every path —
        # the pallas_full kernels emit the pre-reset obs too
        # (emit_final_obs variant, ops/pallas_*_full.py).
        env_state, next_obs, final_obs, reward, term, trunc, info = (
            self.benv.step_final(state.env_state, action.T, k_env)
        )
        succ_obs = final_obs
        buffer = state.buffer.add_batch(
            obs_bf, action, reward, succ_obs.T,
            term.astype(jnp.float32),
            (term | trunc).astype(jnp.float32),
        )
        return state._replace(
            buffer=buffer,
            env_state=env_state,
            obs=next_obs,
            total_steps=state.total_steps + 1,
        ), reward

    def _update(self, state: SACState, key):
        cfg = self.cfg
        k_s, k_next, k_pi = jax.random.split(key, 3)
        obs, action, g, boot_obs, boot_disc = state.buffer.sample_nstep(
            k_s, cfg.batch_size, self.benv.n_envs, cfg.n_step, cfg.gamma
        )
        alpha = jnp.exp(state.log_alpha)

        # targets: G_n + gamma^m (1-done) V(boot_obs); at n_step=1 this is
        # the classic  r + gamma (1-done) V(next_obs)
        n_mean, n_log_std = self.actor.apply(state.actor_params, boot_obs)
        next_a, next_logp = sample_squashed(k_next, n_mean, n_log_std)
        tq1 = self.q.apply(state.q1_target, boot_obs, next_a)
        tq2 = self.q.apply(state.q2_target, boot_obs, next_a)
        target_v = jnp.minimum(tq1, tq2) - alpha * next_logp
        target_q = cfg.reward_scale * g + boot_disc * target_v
        target_q = jax.lax.stop_gradient(target_q)

        def q_loss(params):
            q = self.q.apply(params, obs, action)
            return jnp.mean((q - target_q) ** 2)

        # cross-device mean: per-shard minibatches are equal-sized, so the
        # pmean of per-shard mean-grads IS the grad of the global-batch
        # mean loss (identity when axis_name is unset)
        pmean = (
            (lambda t: jax.tree.map(
                lambda g: jax.lax.pmean(g, self.axis_name), t
            ))
            if self.axis_name
            else (lambda t: t)
        )
        g1 = pmean(jax.grad(q_loss)(state.q1_params))
        g2 = pmean(jax.grad(q_loss)(state.q2_params))
        u1, opt_q1 = self.tx.update(g1, state.opt_q1)
        u2, opt_q2 = self.tx.update(g2, state.opt_q2)
        q1_params = optax.apply_updates(state.q1_params, u1)
        q2_params = optax.apply_updates(state.q2_params, u2)

        def actor_loss(params):
            mean, log_std = self.actor.apply(params, obs)
            a, logp = sample_squashed(k_pi, mean, log_std)
            q = jnp.minimum(
                self.q.apply(q1_params, obs, a), self.q.apply(q2_params, obs, a)
            )
            return jnp.mean(alpha * logp - q), logp

        (a_loss, logp), ga = jax.value_and_grad(actor_loss, has_aux=True)(
            state.actor_params
        )
        ga = pmean(ga)
        ua, opt_actor = self.tx.update(ga, state.opt_actor)
        actor_params = optax.apply_updates(state.actor_params, ua)

        def alpha_loss(log_alpha):
            return -jnp.mean(
                jnp.exp(log_alpha)
                * jax.lax.stop_gradient(logp + self.target_entropy)
            )

        gal = pmean(jax.grad(alpha_loss)(state.log_alpha))
        ual, opt_alpha = self.tx.update(gal, state.opt_alpha)
        log_alpha = optax.apply_updates(state.log_alpha, ual)

        polyak = lambda t, p: jax.tree.map(
            lambda a, b: (1 - cfg.tau) * a + cfg.tau * b, t, p
        )
        metrics = {
            "q_loss": q_loss(q1_params),
            "actor_loss": a_loss,
            "alpha": jnp.exp(log_alpha),
        }
        return state._replace(
            actor_params=actor_params,
            q1_params=q1_params, q2_params=q2_params,
            q1_target=polyak(state.q1_target, q1_params),
            q2_target=polyak(state.q2_target, q2_params),
            log_alpha=log_alpha,
            opt_actor=opt_actor, opt_q1=opt_q1, opt_q2=opt_q2,
            opt_alpha=opt_alpha,
        ), metrics

    def train_step(self, state: SACState, key):
        """cfg.env_steps_per_iter collects + cfg.grad_steps_per_iter updates;
        jit this (donate state)."""
        rews = jnp.zeros(())
        for _ in range(self.cfg.env_steps_per_iter):
            key, k = jax.random.split(key)
            state, r = self._collect(state, k)
            rews = rews + jnp.mean(r)
        metrics = {}
        for _ in range(self.cfg.grad_steps_per_iter):
            key, k = jax.random.split(key)
            state, metrics = self._update(state, k)
        metrics["mean_reward"] = rews / self.cfg.env_steps_per_iter
        return state, metrics

    def make_policy(self, actor_params, deterministic: bool = True):
        def policy(key, obs):
            mean, log_std = self.actor.apply(actor_params, obs.T)
            if deterministic:
                return jnp.tanh(mean).T
            a, _ = sample_squashed(key, mean, log_std)
            return a.T

        return policy
