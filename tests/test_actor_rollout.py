"""Fused actor-rollout kernel (ops/actor_rollout.py) vs the XLA paths.

Three contracts, all driven through the TPU-semantics interpreter on CPU
(the compiled kernel is covered by the driver's bench run and the
RUN_TPU_PERF lane):

1. env semantics — replaying the kernel's own action stream through
   ``step_cached`` (the same cache) reproduces every stored observation,
   direction, reward and done flag bit-exactly, and the final state.
2. policy consistency — ``ActorCritic.apply`` on the stored observations
   reproduces the stored behavior logp/value up to bf16 rounding.
3. sampling — the Gumbel-argmax matches the softmax distribution of the
   stored logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import minigrid_tpu as mg
from minigrid_tpu.ops.actor_rollout import fused_actor_rollout
from minigrid_tpu.rl.model import ActorCritic

STATE_FIELDS = [
    "grid", "contains", "agent_x", "agent_y", "agent_dir", "carrying",
    "step_count", "max_steps", "terminated", "truncated", "mission",
]


def _setup(env_id, n, seed=0, **kwargs):
    env = mg.make(env_id, **kwargs)
    v = env.agent_view_size
    model = ActorCritic(hidden=256, num_actions=env.num_actions)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, n))
    obs0 = jax.vmap(lambda s: env.observation_packed(s).reshape(v * v))(states)
    params = model.init(k2, obs0[:1], states.agent_dir[:1], packed=True)
    return env, model, params, states, k3


def test_actor_kernel_env_replay_and_policy_consistency():
    n, t, r = 1024, 14, 2
    # max_steps=8 < T forces truncation auto-resets through the cache,
    # DoorKey exercises occlusion + pickup/toggle interactions.
    env, model, params, states, key = _setup(
        "MiniGrid-DoorKey-5x5-v0", n, seed=1, max_steps=8
    )
    v = env.agent_view_size
    final, traj = fused_actor_rollout(env, params, states, key, t, r, interpret=True)

    assert int(np.asarray(traj["done"]).sum()) > 0, "no resets exercised"

    # 2) policy consistency on the stored observations
    logits, value = jax.jit(lambda p, o, d: model.apply(p, o, d, packed=True))(
        params,
        traj["obs"].reshape(t * n, v * v),
        traj["direction"].reshape(t * n),
    )
    logp_all = np.asarray(jax.nn.log_softmax(logits))
    act = np.asarray(traj["action"]).reshape(t * n)
    np.testing.assert_allclose(
        np.asarray(traj["logp"]).reshape(t * n),
        logp_all[np.arange(t * n), act],
        atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(traj["value"]).reshape(t * n), np.asarray(value),
        atol=2e-2, rtol=1e-2,
    )

    # 1) env replay: same cache (the kernel's own key path), kernel's actions
    k_cache, _, _ = jax.random.split(key, 3)
    cache = env.batch_reset_cache(k_cache, n, r)
    st, used = states, jnp.zeros((n,), jnp.int32)
    step_cached = jax.jit(jax.vmap(env.step_cached))
    obs_fn = jax.jit(jax.vmap(lambda s: env.observation_packed(s).reshape(v * v)))
    for step in range(t):
        np.testing.assert_array_equal(
            np.asarray(obs_fn(st)), np.asarray(traj["obs"][step]),
            err_msg=f"obs t={step}",
        )
        np.testing.assert_array_equal(
            np.asarray(st.agent_dir), np.asarray(traj["direction"][step])
        )
        _, st, rew, term, trunc, used = step_cached(
            st, traj["action"][step], cache, used
        )
        np.testing.assert_allclose(
            np.asarray(rew), np.asarray(traj["reward"][step]), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(term | trunc), np.asarray(traj["done"][step])
        )
    for f in STATE_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(final, f)), np.asarray(getattr(st, f)), err_msg=f
        )


def test_actor_kernel_sampling_matches_softmax():
    n, t = 1024, 4
    env, model, params, states, key = _setup("MiniGrid-Empty-5x5-v0", n, seed=2)
    v = env.agent_view_size
    _, traj = fused_actor_rollout(env, params, states, key, t, 2, interpret=True)

    logits, _ = jax.jit(lambda p, o, d: model.apply(p, o, d, packed=True))(
        params,
        traj["obs"].reshape(t * n, v * v),
        traj["direction"].reshape(t * n),
    )
    probs = np.asarray(jax.nn.softmax(logits)).mean(axis=0)
    freq = np.bincount(
        np.asarray(traj["action"]).reshape(-1), minlength=env.num_actions
    ) / (t * n)
    # 4096 draws: ~3.5 sigma on a p~1/7 bin is ~0.02
    np.testing.assert_allclose(freq, probs, atol=0.03)
    # determinism: same key, same trajectory
    _, traj2 = fused_actor_rollout(env, params, states, key, t, 2, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(traj["action"]), np.asarray(traj2["action"])
    )


def _replay_check(env_id, n, t, r, seed, extra_fields=True, **kwargs):
    """Replay the kernel's own action stream through the XLA twin of its
    reset semantics — ``step_cached`` with the same cache, or for
    ``covers_reset`` families the counter-reset blend (ext.reset_state on
    the same seed stream) — and demand bit-exact obs/reward/done per step
    plus the final state INCLUDING the family's unpacked ``extra`` pytree."""
    env, model, params, states, key = _setup(env_id, n, seed=seed, **kwargs)
    v = env.agent_view_size
    final, traj = fused_actor_rollout(env, params, states, key, t, r, interpret=True)

    k_cache, _, _ = jax.random.split(key, 3)
    ext = getattr(env, "fused_ext", None)
    if ext is not None and getattr(ext, "covers_reset", False):
        seeds = jax.random.bits(k_cache, (n, 2), jnp.uint32).astype(jnp.int32)

        def one(s, a, sd, u):
            stepped, reward = env.step_env(s, a)
            term, trunc = stepped.terminated, stepped.truncated
            done = term | trunc
            fresh = ext.reset_state(env, sd[0], sd[1], u).replace(rng=stepped.rng)
            new = jax.tree.map(
                lambda f, b: jnp.where(
                    jnp.reshape(done, (1,) * f.ndim) if f.ndim else done, f, b
                ),
                fresh,
                stepped,
            )
            return new, reward, term, trunc, u + done.astype(jnp.int32)

        @jax.jit
        def step_replay(st, actions, used):
            st, rew, term, trunc, used = jax.vmap(one)(st, actions, seeds, used)
            return st, rew, term, trunc, used
    else:
        cache = env.batch_reset_cache(k_cache, n, r)
        step_cached = jax.jit(jax.vmap(env.step_cached))

        def step_replay(st, actions, used):
            _, st, rew, term, trunc, used = step_cached(st, actions, cache, used)
            return st, rew, term, trunc, used

    st, used = states, jnp.zeros((n,), jnp.int32)
    obs_fn = jax.jit(jax.vmap(lambda s: env.observation_packed(s).reshape(v * v)))
    for step in range(t):
        np.testing.assert_array_equal(
            np.asarray(obs_fn(st)), np.asarray(traj["obs"][step]),
            err_msg=f"obs t={step}",
        )
        st, rew, term, trunc, used = step_replay(st, traj["action"][step], used)
        np.testing.assert_allclose(
            np.asarray(rew), np.asarray(traj["reward"][step]), rtol=1e-6,
            err_msg=f"reward t={step}",
        )
        np.testing.assert_array_equal(
            np.asarray(term | trunc), np.asarray(traj["done"][step]),
            err_msg=f"done t={step}",
        )
    for f in STATE_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(final, f)), np.asarray(getattr(st, f)), err_msg=f
        )
    if extra_fields:
        import jax.tree_util as jtu

        ka = jtu.tree_flatten_with_path(final.extra)[0]
        kb = jtu.tree_flatten_with_path(st.extra)[0]
        for (pa, la), (_, lb) in zip(ka, kb):
            np.testing.assert_array_equal(
                np.asarray(la), np.asarray(lb), err_msg=f"extra {pa}"
            )
    return traj


def test_actor_kernel_ext_dynamic_obstacles():
    """fused_ext families run inside the actor kernel: the Dynamic-Obstacles
    counter-based walk (pre_step), >=3 -> left remap (map_action, the
    trajectory stores the ORIGINAL sampled action), and collision penalty
    (post_step) replay bit-exactly through step_cached, including the final
    obstacles/walk_seed extra state."""
    traj = _replay_check("MiniGrid-Dynamic-Obstacles-5x5-v0", 1024, 8, 2, seed=3)
    # The remap means actions >= 3 appear in the stored trajectory.
    assert int((np.asarray(traj["action"]) >= 3).sum()) > 0
    # Collisions end episodes with the -1 penalty.
    assert float(np.asarray(traj["reward"]).min()) == -1.0


def test_actor_kernel_ext_babyai_verifier():
    """The BabyAI verifier automaton (2 tracking planes + 8 packed scalars)
    runs inside the actor kernel: goto-instr successes pay the shaped
    reward and the final InstrState round-trips bit-exactly."""
    traj = _replay_check("BabyAI-GoToRedBallGrey-v0", 1024, 8, 2, seed=5)
    assert int((np.asarray(traj["reward"]) > 0).sum()) > 0, "no successes"


def test_actor_kernel_time_chunking_is_invisible():
    """TC timesteps per kernel invocation (the launch-amortization lever)
    must not change a single bit of the trajectory: same key, different
    ``time_chunk`` -> identical outputs."""
    n, t = 1024, 4
    env, model, params, states, key = _setup("MiniGrid-DoorKey-5x5-v0", n, seed=7)
    fin1, tr1 = fused_actor_rollout(
        env, params, states, key, t, 2, True, 1
    )
    fin2, tr2 = fused_actor_rollout(
        env, params, states, key, t, 2, True, 2
    )
    for f in sorted(tr1):
        np.testing.assert_array_equal(
            np.asarray(tr1[f]), np.asarray(tr2[f]), err_msg=f
        )
    np.testing.assert_array_equal(np.asarray(fin1.grid), np.asarray(fin2.grid))
    np.testing.assert_array_equal(
        np.asarray(fin1.step_count), np.asarray(fin2.step_count)
    )
