"""Fused embed+dense1 kernel (ops/embed_dense.py) vs the XLA ActorCritic
path: forward agreement to bf16 tolerance and gradient agreement of the
custom VJP (dW1/db1 from rebuilt one-hots) on the same param tree.

Runs the kernel in Pallas interpret mode on the CPU backend; the compiled
kernel is exercised on-chip by the RUN_TPU_PERF lane and bench.py's PPO
metric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import minigrid_tpu as mg
from minigrid_tpu.rl.model import ActorCritic, apply_packed_fused


def _setup(n=256, seed=0):
    env = mg.make("MiniGrid-DoorKey-5x5-v0")
    model = ActorCritic(hidden=64, num_actions=env.num_actions)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, n))
    v = env.agent_view_size
    packed = jax.jit(
        jax.vmap(lambda s: env.observation_packed(s).reshape(v * v))
    )(states)
    direction = states.agent_dir
    params = model.init(k2, packed[:1], direction[:1], packed=True)
    return model, params, packed, direction


def test_forward_matches_xla():
    model, params, packed, direction = _setup()
    ref_logits, ref_value = model.apply(params, packed, direction, packed=True)
    got_logits, got_value = apply_packed_fused(
        params, packed, direction, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=0, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(got_value), np.asarray(ref_value), rtol=0, atol=2e-2
    )


def test_forward_leading_batch_dims():
    model, params, packed, direction = _setup()
    p3 = packed.reshape(4, 64, -1)
    d3 = direction.reshape(4, 64)
    ref_logits, ref_value = model.apply(params, p3, d3, packed=True)
    got_logits, got_value = apply_packed_fused(params, p3, d3, interpret=True)
    assert got_logits.shape == ref_logits.shape
    assert got_value.shape == ref_value.shape
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=0, atol=2e-2
    )


def test_gradients_match_xla():
    """The custom VJP's dW1/db1 (one-hots rebuilt per block in the backward
    kernel) must agree with XLA autodiff through the materialized one-hot
    path; downstream layer grads flow through shared jnp ops."""
    model, params, packed, direction = _setup()

    def loss_ref(p):
        logits, value = model.apply(p, packed, direction, packed=True)
        return (jax.nn.log_softmax(logits).sum() * 1e-3 + value.sum() * 1e-3)

    def loss_fused(p):
        logits, value = apply_packed_fused(p, packed, direction, interpret=True)
        return (jax.nn.log_softmax(logits).sum() * 1e-3 + value.sum() * 1e-3)

    g_ref = jax.grad(loss_ref)(params)
    g_got = jax.grad(loss_fused)(params)
    ref_leaves, treedef_r = jax.tree.flatten(g_ref)
    got_leaves, treedef_g = jax.tree.flatten(g_got)
    assert treedef_r == treedef_g
    for a, b in zip(got_leaves, ref_leaves):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(b, np.float32),
            rtol=0,
            atol=2e-2 * scale,
        )
