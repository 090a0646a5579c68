"""IMPALA learner: V-trace correctness against a literal-formula reference
and a learning-curve sanity check (the second learner of the BASELINE north
star's "sharded PPO/IMPALA" pair; the reference ships no learner)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import minigrid_tpu as mg
from minigrid_tpu.rl.impala import IMPALAConfig, make_impala, vtrace


def _vtrace_slow(tl, bl, v, boot, r, disc, rho_clip, c_clip, lam):
    """Direct transcription of arXiv:1802.01561 §4.1, python loops."""
    T, N = r.shape
    rho = np.minimum(np.exp(tl - bl), rho_clip)
    c = lam * np.minimum(np.exp(tl - bl), c_clip)
    nv = np.concatenate([v[1:], boot[None]], axis=0)
    vs = np.zeros_like(v)
    for n in range(N):
        acc = 0.0
        for t in range(T - 1, -1, -1):
            delta = rho[t, n] * (r[t, n] + disc[t, n] * nv[t, n] - v[t, n])
            acc = delta + disc[t, n] * c[t, n] * acc
            vs[t, n] = v[t, n] + acc
    next_vs = np.concatenate([vs[1:], boot[None]], axis=0)
    pg_adv = rho * (r + disc * next_vs - v)
    return vs, pg_adv


def test_vtrace_matches_formula():
    rng = np.random.default_rng(0)
    T, N = 13, 5
    tl = rng.normal(size=(T, N)).astype(np.float32) * 0.3
    bl = rng.normal(size=(T, N)).astype(np.float32) * 0.3
    v = rng.normal(size=(T, N)).astype(np.float32)
    boot = rng.normal(size=(N,)).astype(np.float32)
    r = rng.normal(size=(T, N)).astype(np.float32)
    disc = (0.97 * (rng.random(size=(T, N)) > 0.15)).astype(np.float32)

    want_vs, want_adv = _vtrace_slow(tl, bl, v, boot, r, disc, 1.0, 1.0, 0.95)
    got_vs, got_adv = vtrace(
        jnp.asarray(tl), jnp.asarray(bl), jnp.asarray(v), jnp.asarray(boot),
        jnp.asarray(r), jnp.asarray(disc), 1.0, 1.0, 0.95,
    )
    np.testing.assert_allclose(np.asarray(got_vs), want_vs, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_adv), want_adv, rtol=1e-5, atol=1e-5)

    # On-policy with rho/c >= 1 and lam=1, vtrace degenerates to n-step
    # TD(lambda=1) returns: vs_t = sum gamma^k r + gamma^K boot.
    disc1 = np.full((T, N), 0.9, np.float32)
    vs_on, _ = vtrace(
        jnp.asarray(tl), jnp.asarray(tl), jnp.asarray(v), jnp.asarray(boot),
        jnp.asarray(r), jnp.asarray(disc1), 1.0, 1.0, 1.0,
    )
    want = np.zeros((T, N), np.float32)
    acc = boot.copy()
    for t in range(T - 1, -1, -1):
        acc = r[t] + 0.9 * acc
        want[t] = acc
    np.testing.assert_allclose(np.asarray(vs_on), want, rtol=1e-4, atol=1e-4)


def test_impala_improves_on_empty():
    env = mg.make("MiniGrid-Empty-8x8-v0")
    config = IMPALAConfig(
        rollout_steps=64,
        num_minibatches=4,
        update_epochs=2,
        learning_rate=1e-3,
        entropy_coef=0.005,
    )
    init_fn, train_step = make_impala(env, config, hidden=64)
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
    assert late > early * 1.5 + 1e-4, f"no learning: early {early:.5f} late {late:.5f}"
    assert late > 0.01, f"final reward/step too low: {late:.5f}"
