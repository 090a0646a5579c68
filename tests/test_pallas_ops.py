"""Pallas kernel correctness vs the XLA reference path (interpret mode on
CPU; the same comparison runs compiled on real TPU via
tools/test_pallas_obs.py, where it matched bit-exactly on 2048 random
DoorKey states)."""

from __future__ import annotations

import jax
import numpy as np
import pytest

import minigrid_tpu as mg
from minigrid_tpu.core.constants import unpack_grid
from minigrid_tpu.core.obs import gen_obs_image
from minigrid_tpu.ops.obs_pallas import fused_obs_packed
from minigrid_tpu.parallel.vector import rollout_random


@pytest.mark.parametrize("env_id", ["MiniGrid-DoorKey-5x5-v0", "MiniGrid-Empty-8x8-v0"])
def test_fused_obs_matches_xla(env_id):
    env = mg.make(env_id)
    n = 64
    key = jax.random.PRNGKey(0)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, n))
    states, _, _, _ = rollout_random(env, states, key, 25)

    ref = np.asarray(
        jax.jit(jax.vmap(lambda s: gen_obs_image(s, 7, env.see_through_walls)))(states)
    )
    packed = fused_obs_packed(
        states.grid,
        states.agent_x,
        states.agent_y,
        states.agent_dir,
        states.carrying,
        7,
        env.see_through_walls,
        block=n,
        interpret=True,
    )
    got = np.asarray(unpack_grid(packed))
    np.testing.assert_array_equal(got, ref)


def test_threefry2x32_known_answer_vectors():
    """ops/prng.threefry2x32 against the Random123 reference KAT vectors
    (Salmon et al., SC'11) — the stream the Dynamic-Obstacles walk shares
    between the XLA _pre_step path and the fused kernel."""
    from minigrid_tpu.ops.prng import threefry2x32

    cases = [
        ((0, 0), (0, 0), (0x6B200159, 0x99BA4EFE)),
        (
            (0xFFFFFFFF, 0xFFFFFFFF),
            (0xFFFFFFFF, 0xFFFFFFFF),
            (0x1CB996FC, 0xBB002BE7),
        ),
        (
            (0x13198A2E, 0x03707344),
            (0x243F6A88, 0x85A308D3),
            (0xC4923A9C, 0x483DF7A0),
        ),
    ]
    import jax.numpy as jnp

    for (k0, k1), (x0, x1), (e0, e1) in cases:
        y0, y1 = threefry2x32(
            jnp.uint32(k0), jnp.uint32(k1), jnp.uint32(x0), jnp.uint32(x1)
        )
        assert (int(y0), int(y1)) == (e0, e1)


def test_uniform_index_range_and_uniformity():
    import jax.numpy as jnp

    from minigrid_tpu.ops.prng import threefry2x32, uniform_index

    ctr = jnp.arange(4096, dtype=jnp.uint32)
    bits, _ = threefry2x32(jnp.uint32(7), jnp.uint32(11), ctr, jnp.uint32(0))
    for count in (1, 2, 9):
        idx = np.asarray(uniform_index(bits, jnp.int32(count)))
        assert idx.min() >= 0 and idx.max() < count
        if count > 1:
            hist = np.bincount(idx, minlength=count) / idx.size
            np.testing.assert_allclose(hist, 1.0 / count, atol=0.03)
