"""Sharded PPO learner over the batched environment.

The whole actor-learner loop is one jitted SPMD program: rollout T steps
under ``lax.scan`` (auto-reset fused, trajectories never leave the device),
compute GAE, one clipped-surrogate update.  The env batch shards over the
mesh's ``data`` axis; parameters are replicated, so XLA's partitioner turns
the gradient reduction into a ``psum`` over ICI — the TPU-native counterpart
of the NCCL all-reduce the reference never had (SURVEY.md §2.9/§5.8).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from minigrid_tpu.rl.model import ActorCritic
from minigrid_tpu.rl.rollout import collect_trajectory


class PPOConfig(NamedTuple):
    rollout_steps: int = 128
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    value_coef: float = 0.5
    entropy_coef: float = 0.01
    learning_rate: float = 2.5e-4
    max_grad_norm: float = 0.5
    # Pre-generated levels per env per rollout chunk.  None sizes the cache
    # from the measured episode-rate table (parallel/reset_budget.resets_for)
    # — an undersized cache silently replays its last level, violating the
    # reference's fresh-reset contract; monitor the emitted
    # ``max_episodes_per_chunk`` metric against this value.
    resets_per_chunk: int | None = None
    # Gradient minibatches per update (bounds the one-hot featurization's
    # activation memory at large env counts) and epochs over the rollout.
    num_minibatches: int = 8
    update_epochs: int = 1
    # Linear LR anneal to 0 over this many train_step calls (None = constant).
    lr_anneal_updates: int | None = None


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    env_states: Any
    key: jax.Array


def make_ppo(
    env,
    config: PPOConfig = PPOConfig(),
    hidden: int = 256,
    mesh=None,
    axis_name: str = "data",
):
    """Build (init_fn, train_step_fn) for the given env family.

    ``init_fn(key, num_envs) -> TrainState``;
    ``train_step_fn(state) -> (TrainState, metrics)`` — pure and jittable,
    suitable for ``jax.jit(..., in_shardings=...)`` over a device mesh.

    On a multi-chip mesh pass ``mesh``: the rollout then runs under
    ``shard_map`` (each device collects its local env shard, through the
    fused actor kernel when eligible — unreachable via the SPMD partitioner,
    which cannot partition a custom call), while GAE and the minibatched
    update stay on the partitioner as before.
    """
    from minigrid_tpu.parallel.reset_budget import resets_for

    model = ActorCritic(hidden=hidden, num_actions=env.num_actions)
    resets_per_chunk = (
        config.resets_per_chunk
        if config.resets_per_chunk is not None
        else resets_for(env, config.rollout_steps)
    )
    if config.lr_anneal_updates is None:
        lr = config.learning_rate
    else:
        lr = optax.linear_schedule(
            init_value=config.learning_rate,
            end_value=0.0,
            transition_steps=config.lr_anneal_updates
            * config.num_minibatches
            * config.update_epochs,
        )
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(lr, eps=1e-5),
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

    def rollout(params, env_states, key):
        # Shared collector (rl/rollout.py): lax.scan over time, auto-reset
        # fused (or the per-chunk reset cache for expensive-reset families),
        # image stored flat to avoid minor-dim tile blowup.
        return collect_trajectory(
            env, policy_apply, params, env_states, key,
            config.rollout_steps, resets_per_chunk,
            fused_actor=True,  # policy_apply IS the standard packed forward
            mesh=mesh, axis_name=axis_name,
        )

    def gae(values, rewards, dones, last_value):
        # adv_t = delta_t + c_t * adv_{t+1} with c_t = gamma*lambda*nonterm_t
        # is an affine recurrence; jax.lax.associative_scan evaluates it in
        # log2(T) composition rounds of [T, N]-wide elementwise work instead
        # of T sequential [N]-wide steps (the T=128 sequential scan cost
        # ~1.5 ms of launch-bound time per update on-chip).
        nonterm = 1.0 - dones.astype(jnp.float32)
        next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)
        delta = rewards + config.gamma * next_values * nonterm - values
        coef = config.gamma * config.gae_lambda * nonterm

        def compose(a, b):
            # associative_scan(reverse=True) passes the LATER-index suffix as
            # ``a``; composing f_b (outer) with f_a (inner): x -> b_b + A_b*
            # (b_a + A_a*x).  Verified element-exact (to f32 re-association)
            # against the sequential recurrence in tests/test_ppo_learning.py.
            return a[0] * b[0], b[1] + b[0] * a[1]

        _, advs = jax.lax.associative_scan(
            compose, (coef, delta), reverse=True, axis=0
        )
        return advs

    def loss_fn(params, batch, apply_fn=policy_apply):
        obs, direction, action, old_logp, adv, target = batch
        logits, value = apply_fn(params, obs, direction)
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.sum(
            jnp.where(
                action[..., None] == jnp.arange(logits.shape[-1]), logp_all, 0.0
            ),
            axis=-1,
        )
        ratio = jnp.exp(logp - old_logp)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv_n,
            jnp.clip(ratio, 1 - config.clip_eps, 1 + config.clip_eps) * adv_n,
        ).mean()
        v_loss = 0.5 * jnp.square(value - target).mean()
        entropy = -(jnp.exp(logp_all) * logp_all).sum(-1).mean()
        loss = pg + config.value_coef * v_loss - config.entropy_coef * entropy
        return loss, (pg, v_loss, entropy)

    def update(params, opt_state, key, env_states, traj):
        """GAE + minibatched clipped-surrogate update on a collected
        trajectory; the learner phase of ``train_step``, exposed separately
        (as ``train_step.update``) for phase profiling and the overlapped
        dispatch pipeline."""
        obs, direction, action, logp, value, reward, done = traj
        v = env.agent_view_size
        last_obs = jax.vmap(lambda s: env.observation_packed(s).reshape(v * v))(env_states)
        _, last_value = policy_apply(params, last_obs, env_states.agent_dir)
        adv = gae(value, reward, done, last_value)
        target = adv + value
        # Minibatches are CONTIGUOUS TIME slices of the time-major trajectory:
        # timesteps of independent envs are iid across the batch axis, so a
        # [b*mbt:(b+1)*mbt, :, ...] window is a valid PPO minibatch, and
        # slicing axis 0 costs nothing — no sample permutation (a 1M tiny-row
        # gather), no [T, N] -> [N, T] transpose (uint8 tile realignment,
        # 100s of ms at 32k envs), and — critically for SPMD — the slice is
        # along the REPLICATED axis, so an env batch sharded over the mesh's
        # data axis stays sharded through the whole update (env-axis slices
        # would straddle shards and make XLA all-gather the trajectory;
        # measured 6.5x slower at 8 devices).
        data = (obs, direction, action, logp, adv, target)
        num_steps = obs.shape[0]
        assert num_steps % config.num_minibatches == 0, (
            f"rollout_steps={num_steps} must divide into "
            f"num_minibatches={config.num_minibatches} (time-axis slicing)"
        )
        mb_t = num_steps // config.num_minibatches

        # First layer through the fused embed+dense1 kernel when eligible
        # (single TPU device, block-divisible sample count): the one-hot
        # feature tensor stays in VMEM instead of costing ~6 GB of HBM
        # traffic per update (ops/embed_dense.py).
        from minigrid_tpu.ops.embed_dense import supports_embed_dense1
        from minigrid_tpu.rl.model import apply_packed_fused

        num_envs = obs.shape[1]
        use_fused_embed = (
            mesh is None
            and jax.device_count() == 1
            and supports_embed_dense1(mb_t * num_envs)
        )
        apply_fn = apply_packed_fused if use_fused_embed else policy_apply

        def run_epoch(carry, _):
            params, opt_state, key = carry

            def run_mb(carry, b):
                params, opt_state = carry
                # Keep the [mb_t, N, ...] shape: flattening would interleave
                # the sharded env axis into the time axis and force a
                # reshard; the model and loss are rank-agnostic.
                batch = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, b * mb_t, mb_t, axis=0
                    ),
                    data,
                )
                grads, aux = jax.grad(loss_fn, has_aux=True)(
                    params, batch, apply_fn
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), auxes = jax.lax.scan(
                run_mb, (params, opt_state), jnp.arange(config.num_minibatches)
            )
            return (params, opt_state, key), auxes

        (params, opt_state, key), auxes = jax.lax.scan(
            run_epoch,
            (params, opt_state, key),
            None,
            length=config.update_epochs,
        )
        pg, v_loss, entropy = jax.tree.map(jnp.mean, auxes)
        metrics = {
            "pg_loss": pg,
            "value_loss": v_loss,
            "entropy": entropy,
            "reward_per_step": reward.mean(),
            "episodes": done.sum(),
            # Reset-budget certification (parallel/reset_budget): the most
            # episodes any env finished this chunk.  Exceeding the
            # configured resets_per_chunk means the reset cache replayed
            # its last level (reference contract violation) — exempt for
            # deterministic_generation families.
            "max_episodes_per_chunk": done.astype(jnp.int32).sum(axis=0).max(),
        }
        return params, opt_state, key, metrics

    def train_step(state: TrainState):
        env_states, key, traj = rollout(state.params, state.env_states, state.key)
        params, opt_state, key, metrics = update(
            state.params, state.opt_state, key, env_states, traj
        )
        return TrainState(params, opt_state, env_states, key), metrics

    train_step.rollout = rollout
    train_step.update = update
    train_step.gae = gae
    return init_fn, train_step


def make_train(env, config: PPOConfig = PPOConfig(), hidden: int = 256):
    """Whole-training-run-in-one-jit convenience: returns
    ``train(key, num_envs, num_updates) -> (TrainState, stacked metrics)``.

    The update loop is a ``lax.scan`` over ``train_step`` — one compiled
    program per (num_envs, num_updates) shape, zero host round-trips between
    updates (dispatch overhead amortizes away; metrics come back stacked
    [num_updates]).
    """
    init_fn, train_step = make_ppo(env, config, hidden=hidden)

    @partial(jax.jit, static_argnums=(1, 2))
    def train(key: jax.Array, num_envs: int, num_updates: int):
        state = init_fn(key, num_envs)

        def body(state, _):
            state, metrics = train_step(state)
            return state, metrics

        return jax.lax.scan(body, state, None, length=num_updates)

    return train


@partial(jax.jit, static_argnums=(0,))
def forward_step(model: ActorCritic, params, image, direction):
    """Jittable flagship forward pass (used by __graft_entry__.entry)."""
    return model.apply(params, image, direction)
