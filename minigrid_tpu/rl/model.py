"""Actor-critic network for Minigrid observations.

The reference ships no model code (it is an environment library); this is the
learner half of the BASELINE.json north star: a sharded PPO agent consuming
batched symbolic observations.  Design is TPU-first: the uint8 (v, v, 3)
observation is embedded by one-hot planes and fed to dense bfloat16 matmuls
(MXU-shaped), no convs needed at 7x7 scale.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from minigrid_tpu.core.actions import NUM_ACTIONS
from minigrid_tpu.core.constants import NUM_COLORS, NUM_OBJECTS


def embed_obs(image: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., v, v, 3] + int32[...] -> float32[..., F] one-hot features."""
    t = jnp.asarray(image[..., 0], jnp.int32)
    c = jnp.asarray(image[..., 1], jnp.int32)
    s = jnp.asarray(image[..., 2], jnp.int32)
    feats = jnp.concatenate(
        [
            jnp.eye(NUM_OBJECTS, dtype=jnp.float32)[t],
            jnp.eye(NUM_COLORS, dtype=jnp.float32)[c],
            jnp.eye(3, dtype=jnp.float32)[jnp.clip(s, 0, 2)],
        ],
        axis=-1,
    )
    flat = feats.reshape(feats.shape[: -3] + (-1,))
    dir_oh = jnp.eye(4, dtype=jnp.float32)[jnp.asarray(direction, jnp.int32)]
    return jnp.concatenate([flat, dir_oh], axis=-1)


class ActorCritic(nn.Module):
    """MLP torso with policy and value heads; bf16 compute, f32 params."""

    hidden: int = 256
    num_actions: int = NUM_ACTIONS

    @nn.compact
    def __call__(self, image: jnp.ndarray, direction: jnp.ndarray):
        x = embed_obs(image, direction).astype(jnp.bfloat16)
        x = nn.Dense(self.hidden, dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden, dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        logits = nn.Dense(self.num_actions, dtype=jnp.float32)(x)
        value = nn.Dense(1, dtype=jnp.float32)(x)
        return logits, jnp.squeeze(value, -1)
