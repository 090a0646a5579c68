"""Sharded IMPALA-style learner (V-trace off-policy actor-critic).

The second learner named by the BASELINE north star ("sharded PPO/IMPALA
learner"); the reference ships no learner at all.  Like rl/ppo.py the whole
actor-learner loop is one jitted SPMD program — rollout under ``lax.scan``,
V-trace targets, policy-gradient + value + entropy update — with the env
batch sharded over the mesh's ``data`` axis and replicated parameters, so
XLA turns the gradient reduction into a ``psum`` over ICI.

On TPU the natural IMPALA topology is synchronous SPMD rather than
asynchronous actor processes: off-policyness enters through multiple
learner epochs per rollout (and, multi-host, through parameter staleness),
and the V-trace correction (Espeholt et al. 2018, arXiv:1802.01561) keeps
the targets unbiased under it.  Updates run on contiguous TIME slices of
the time-major trajectory, each slice bootstrapped from the value of its
own end-of-window observation — the same sharding-friendly minibatch
scheme as rl/ppo.py (slices along the replicated time axis never force a
reshard of the env-sharded batch).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from minigrid_tpu.rl.model import ActorCritic
from minigrid_tpu.rl.rollout import collect_trajectory


class IMPALAConfig(NamedTuple):
    rollout_steps: int = 128
    gamma: float = 0.99
    rho_clip: float = 1.0  # importance-weight clip for the vtrace deltas
    c_clip: float = 1.0  # trace-cutting clip
    vtrace_lambda: float = 1.0  # extra trace decay (lambda in the paper's c_t)
    value_coef: float = 0.5
    entropy_coef: float = 0.01
    learning_rate: float = 3e-4
    max_grad_norm: float = 0.5
    # None sizes the reset cache from the measured episode-rate table
    # (parallel/reset_budget.resets_for); see PPOConfig.resets_per_chunk.
    resets_per_chunk: int | None = None
    num_minibatches: int = 8
    update_epochs: int = 1


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    env_states: Any
    key: jax.Array


def vtrace(
    target_logp,
    behavior_logp,
    values,
    bootstrap_value,
    rewards,
    discounts,
    rho_clip: float = 1.0,
    c_clip: float = 1.0,
    lam: float = 1.0,
):
    """V-trace targets and policy-gradient advantages (arXiv:1802.01561 §4.1).

    All inputs time-major [T, ...]; ``bootstrap_value`` is V(x_T).
    Returns (vs [T, ...], pg_adv [T, ...]):

        rho_t  = min(rho_clip, e^{target-behavior})
        c_t    = lam * min(c_clip, e^{target-behavior})
        delta_t = rho_t (r_t + gamma_t V(x_{t+1}) - V(x_t))
        vs_t - V_t = delta_t + gamma_t c_t (vs_{t+1} - V_{t+1})
        pg_adv_t = rho_t (r_t + gamma_t vs_{t+1} - V_t)
    """
    rho_raw = jnp.exp(target_logp - behavior_logp)
    rho = jnp.minimum(rho_raw, rho_clip)
    c = lam * jnp.minimum(rho_raw, c_clip)
    next_values = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    delta = rho * (rewards + discounts * next_values - values)

    def body(acc, inp):
        delta_t, disc_t, c_t = inp
        acc = delta_t + disc_t * c_t * acc
        return acc, acc

    _, err = jax.lax.scan(
        body, jnp.zeros_like(bootstrap_value), (delta, discounts, c), reverse=True
    )
    vs = values + err
    next_vs = jnp.concatenate([vs[1:], bootstrap_value[None]], axis=0)
    pg_adv = rho * (rewards + discounts * next_vs - values)
    # Targets are targets: no gradient flows back through them.
    return jax.lax.stop_gradient(vs), jax.lax.stop_gradient(pg_adv)


def make_impala(
    env,
    config: IMPALAConfig = IMPALAConfig(),
    hidden: int = 256,
    mesh=None,
    axis_name: str = "data",
):
    """Build (init_fn, train_step_fn) — same contract as rl/ppo.make_ppo
    (including the ``mesh`` shard_map rollout for multi-chip)."""
    from minigrid_tpu.parallel.reset_budget import resets_for

    model = ActorCritic(hidden=hidden, num_actions=env.num_actions)
    _resets_per_chunk = (
        config.resets_per_chunk
        if config.resets_per_chunk is not None
        else resets_for(env, config.rollout_steps)
    )
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.learning_rate, eps=1e-5),
    )

    def init_fn(key: jax.Array, num_envs: int) -> TrainState:
        k_param, k_env, k_loop = jax.random.split(key, 3)
        _, env_states = jax.vmap(env.reset)(jax.random.split(k_env, num_envs))
        v = env.agent_view_size
        packed = jax.vmap(lambda s: env.observation_packed(s).reshape(v * v))(env_states)
        params = model.init(
            k_param, packed[:1], env_states.agent_dir[:1], packed=True
        )
        opt_state = tx.init(params)
        return TrainState(params, opt_state, env_states, k_loop)

    def policy_apply(params, packed_obs, direction):
        return model.apply(params, packed_obs, direction, packed=True)

    def loss_fn(params, batch, apply_fn=policy_apply):
        obs, direction, action, behavior_logp, reward, done, boot_obs, boot_dir = batch
        logits, values = apply_fn(params, obs, direction)
        _, boot_value = apply_fn(params, boot_obs, boot_dir)
        logp_all = jax.nn.log_softmax(logits)
        target_logp = jnp.sum(
            jnp.where(
                action[..., None] == jnp.arange(logits.shape[-1]), logp_all, 0.0
            ),
            axis=-1,
        )
        discounts = config.gamma * (1.0 - done.astype(jnp.float32))
        vs, pg_adv = vtrace(
            target_logp,
            behavior_logp,
            values,
            boot_value,
            reward,
            discounts,
            config.rho_clip,
            config.c_clip,
            config.vtrace_lambda,
        )
        pg_loss = -(target_logp * pg_adv).mean()
        v_loss = 0.5 * jnp.square(values - vs).mean()
        entropy = -(jnp.exp(logp_all) * logp_all).sum(-1).mean()
        loss = pg_loss + config.value_coef * v_loss - config.entropy_coef * entropy
        return loss, (pg_loss, v_loss, entropy)

    def train_step(state: TrainState):
        env_states, key, traj = collect_trajectory(
            env,
            policy_apply,
            state.params,
            state.env_states,
            key=state.key,
            rollout_steps=config.rollout_steps,
            resets_per_chunk=_resets_per_chunk,
            fused_actor=True,  # policy_apply IS the standard packed forward
            mesh=mesh,
            axis_name=axis_name,
        )
        v = env.agent_view_size
        last_packed = jax.vmap(lambda s: env.observation_packed(s).reshape(v * v))(env_states)
        last_dir = env_states.agent_dir

        num_steps = config.rollout_steps
        assert num_steps % config.num_minibatches == 0, (
            f"rollout_steps={num_steps} must divide into "
            f"num_minibatches={config.num_minibatches} (time-axis slicing)"
        )
        mb_t = num_steps // config.num_minibatches

        # First layer through the fused embed+dense1 kernel when eligible
        # (same gate as rl/ppo.py: single TPU device, block-divisible
        # sample counts for both the minibatch and the bootstrap batch).
        from minigrid_tpu.ops.embed_dense import supports_embed_dense1
        from minigrid_tpu.rl.model import apply_packed_fused

        num_envs_b = traj.obs.shape[1]
        use_fused_embed = (
            mesh is None
            and jax.device_count() == 1
            and supports_embed_dense1(mb_t * num_envs_b)
            and supports_embed_dense1(num_envs_b)
        )
        apply_fn = apply_packed_fused if use_fused_embed else policy_apply

        data = (traj.obs, traj.direction, traj.action, traj.logp,
                traj.reward, traj.done)

        def run_epoch(carry, _):
            params, opt_state = carry

            def run_mb(carry, b):
                params, opt_state = carry
                sl = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(x, b * mb_t, mb_t, 0),
                    data,
                )
                # Bootstrap obs for this window: the first obs of the next
                # window, or the post-rollout obs for the final one.
                boot_obs = jnp.where(
                    (b + 1) * mb_t < num_steps,
                    jax.lax.dynamic_index_in_dim(
                        traj.obs, jnp.minimum((b + 1) * mb_t, num_steps - 1),
                        0, keepdims=False,
                    ),
                    last_packed,
                )
                boot_dir = jnp.where(
                    (b + 1) * mb_t < num_steps,
                    jax.lax.dynamic_index_in_dim(
                        traj.direction, jnp.minimum((b + 1) * mb_t, num_steps - 1),
                        0, keepdims=False,
                    ),
                    last_dir,
                )
                grads, aux = jax.grad(loss_fn, has_aux=True)(
                    params, sl + (boot_obs, boot_dir), apply_fn
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), auxes = jax.lax.scan(
                run_mb, (params, opt_state), jnp.arange(config.num_minibatches)
            )
            return (params, opt_state), auxes

        (params, opt_state), auxes = jax.lax.scan(
            run_epoch,
            (state.params, state.opt_state),
            None,
            length=config.update_epochs,
        )
        pg, v_loss, entropy = jax.tree.map(jnp.mean, auxes)
        metrics = {
            "pg_loss": pg,
            "value_loss": v_loss,
            "entropy": entropy,
            "reward_per_step": traj.reward.mean(),
            "episodes": traj.done.sum(),
            # Reset-budget certification (parallel/reset_budget): must stay
            # <= the configured resets_per_chunk for honest iid resets.
            "max_episodes_per_chunk": traj.done.astype(jnp.int32)
            .sum(axis=0)
            .max(),
        }
        return TrainState(params, opt_state, env_states, key), metrics

    return init_fn, train_step
