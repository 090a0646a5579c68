"""PPO learning-curve sanity check: the learner must actually improve on
Empty-8x8 within a small number of updates (the reference ships no learner;
this guards the BASELINE north-star configuration end to end — rollout, GAE,
minibatched update, auto-reset)."""

from __future__ import annotations

import jax
import numpy as np

import minigrid_tpu as mg
from minigrid_tpu.rl.ppo import PPOConfig, make_ppo


def test_ppo_improves_on_empty():
    env = mg.make("MiniGrid-Empty-8x8-v0")
    config = PPOConfig(
        rollout_steps=64,
        num_minibatches=4,
        update_epochs=2,
        learning_rate=1e-3,
        entropy_coef=0.005,
    )
    init_fn, train_step = make_ppo(env, config, hidden=64)
    state = init_fn(jax.random.PRNGKey(0), num_envs=128)
    step = jax.jit(train_step)

    rewards = []
    for _ in range(30):
        state, metrics = step(state)
        rewards.append(float(metrics["reward_per_step"]))
        assert np.isfinite(rewards[-1])
        assert np.isfinite(float(metrics["pg_loss"]))

    early = float(np.mean(rewards[:5]))
    late = float(np.mean(rewards[-5:]))
    # Empty-8x8 random policy reward/step is ~0.001-0.01; a learner that
    # works reliably multiplies it severalfold within 30 updates.
    assert late > early * 1.5 + 1e-4, f"no learning: early {early:.5f} late {late:.5f}"
    assert late > 0.01, f"final reward/step too low: {late:.5f}"


def test_make_train_scanned_loop():
    """Whole-run-in-one-jit trainer: scanned updates return stacked metrics
    and honor the LR anneal schedule."""
    from minigrid_tpu.rl.ppo import make_train

    env = mg.make("MiniGrid-Empty-5x5-v0")
    train = make_train(
        env,
        PPOConfig(rollout_steps=16, num_minibatches=2, lr_anneal_updates=4),
        hidden=32,
    )
    state, metrics = train(jax.random.PRNGKey(1), 32, 4)
    assert metrics["reward_per_step"].shape == (4,)
    assert np.isfinite(np.asarray(metrics["pg_loss"])).all()
    assert int(state.env_states.step_count.shape[0]) == 32


def test_gae_associative_matches_sequential():
    """The associative-scan GAE (rl/ppo.py gae) must reproduce the textbook
    sequential recurrence adv_t = delta_t + gamma*lambda*nonterm_t*adv_{t+1}
    element-for-element (up to f32 re-association)."""
    import jax.numpy as jnp

    gamma, lam = 0.99, 0.95
    T, N = 32, 16
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 4)
    values = jax.random.normal(ks[0], (T, N))
    rewards = jax.random.normal(ks[1], (T, N))
    dones = jax.random.bernoulli(ks[2], 0.25, (T, N))
    last_value = jax.random.normal(ks[3], (N,))

    def seq(values, rewards, dones, last_value):
        def body(carry, inp):
            adv_next, v_next = carry
            value, reward, done = inp
            nonterm = 1.0 - done.astype(jnp.float32)
            delta = reward + gamma * v_next * nonterm - value
            adv = delta + gamma * lam * nonterm * adv_next
            return (adv, value), adv

        _, advs = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value),
            (values, rewards, dones),
            reverse=True,
        )
        return advs

    env = mg.make("MiniGrid-Empty-5x5-v0")
    _, train_step = make_ppo(
        env, PPOConfig(gamma=gamma, gae_lambda=lam, rollout_steps=T)
    )
    advs = train_step.gae(values, rewards, dones, last_value)
    np.testing.assert_allclose(
        np.asarray(seq(values, rewards, dones, last_value)),
        np.asarray(advs),
        rtol=2e-4,
        atol=1e-5,
    )
