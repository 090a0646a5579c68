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


_PER_CELL = NUM_OBJECTS + NUM_COLORS + 3  # one-hot features per view cell


def _onehot_feats(t, c, s, direction, v2: int) -> jnp.ndarray:
    """Per-plane bf16 one-hots, concatenated per cell then flattened.

    Feature order per cell: 11 type + 6 color + 3 state, cells major, then
    4 direction one-hots — identical to the original flat-iota layout.

    Three narrow [.., v2, K] bf16 comparisons fuse into the concat producer;
    round-2's broadcast+reshape-on-s32 formulation instead materialized
    [.., v2, 20] int32 broadcast copies (3 of them) that dominated the PPO
    update — 43.8 -> 14.1 ms/update measured on-chip from this change alone.
    """
    oh_t = (t[..., None] == jnp.arange(NUM_OBJECTS, dtype=jnp.int32)).astype(
        jnp.bfloat16
    )
    oh_c = (c[..., None] == jnp.arange(NUM_COLORS, dtype=jnp.int32)).astype(
        jnp.bfloat16
    )
    oh_s = (
        jnp.clip(s, 0, 2)[..., None] == jnp.arange(3, dtype=jnp.int32)
    ).astype(jnp.bfloat16)
    feats = jnp.concatenate([oh_t, oh_c, oh_s], axis=-1).reshape(
        t.shape[:-1] + (v2 * _PER_CELL,)
    )
    dir_oh = (
        jnp.asarray(direction, jnp.int32)[..., None]
        == jnp.arange(4, dtype=jnp.int32)
    ).astype(jnp.bfloat16)
    return jnp.concatenate([feats, dir_oh], axis=-1)


def embed_obs(image: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., v, v, 3] + int32[...] -> bf16[..., F] one-hot features.

    bf16 from the start: the feature tensor is the activation-bandwidth hot
    spot (986 floats/sample); materializing it wider doubles HBM traffic for
    zero benefit (values are exactly 0/1).
    """
    v2 = image.shape[-3] * image.shape[-2]
    lead = image.shape[:-3]
    img = jnp.asarray(image, jnp.int32).reshape(lead + (v2, 3))
    return _onehot_feats(img[..., 0], img[..., 1], img[..., 2], direction, v2)


def embed_obs_packed(packed: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """int32[..., v*v] PACKED view + int32[...] -> bf16[..., F] features.

    Produces EXACTLY the same feature vector as :func:`embed_obs` on the
    unpacked uint8 image (the one-hot tables are identical), but from the
    learner-side packed observation (core/obs.gen_obs_packed): the type /
    color / state planes come from bit-field extraction on a flat [.., v*v]
    int32 tensor, so the rollout storage and the update path never touch a
    size-3 minor dimension or a uint8<->int32 unpack round-trip.
    """
    v2 = packed.shape[-1]
    p = jnp.asarray(packed, jnp.int32)
    return _onehot_feats(p & 0xFF, (p >> 8) & 0xFF, (p >> 16) & 0xFF, direction, v2)


def apply_packed_fused(params, packed, direction, interpret: bool = False):
    """ActorCritic forward on PACKED observations with the first layer run
    through the fused embed+dense1 Pallas kernel (ops/embed_dense.py) —
    the one-hot feature tensor never touches HBM.

    Mirrors ``ActorCritic.apply(params, packed, direction, packed=True)``
    layer by layer on the raw param tree (same tree — parameters are
    interchangeable); agrees up to bf16 rounding (tests/test_embed_dense.py).
    ``packed`` may carry leading batch dims; they are flattened for the
    kernel and restored on the outputs.
    """
    from minigrid_tpu.ops.embed_dense import embed_dense1

    p = params["params"]
    lead = packed.shape[:-1]
    v2 = packed.shape[-1]
    m = 1
    for s in lead:
        m *= s
    x = embed_dense1(
        p["Dense_0"]["kernel"],
        p["Dense_0"]["bias"],
        packed.reshape(m, v2),
        direction.reshape(m),
        int(round(v2**0.5)),
        interpret=interpret,
    )
    x = nn.relu(x)
    w2 = p["Dense_1"]["kernel"].astype(jnp.bfloat16)
    b2 = p["Dense_1"]["bias"].astype(jnp.bfloat16)
    x = nn.relu(jnp.dot(x, w2) + b2)
    xf = x.astype(jnp.float32)
    logits = jnp.dot(xf, p["Dense_2"]["kernel"]) + p["Dense_2"]["bias"]
    value = jnp.dot(xf, p["Dense_3"]["kernel"]) + p["Dense_3"]["bias"]
    return (
        logits.reshape(lead + (logits.shape[-1],)),
        value[..., 0].reshape(lead),
    )


class ActorCritic(nn.Module):
    """MLP torso with policy and value heads; bf16 compute, f32 params.

    ``image`` may be the reference uint8 (v, v, 3) encoding (API surface) or
    the packed int32 [v*v] learner observation (``packed=True``) — both embed
    to the identical feature vector, so parameters are interchangeable.
    """

    hidden: int = 256
    num_actions: int = NUM_ACTIONS

    @nn.compact
    def __call__(self, image: jnp.ndarray, direction: jnp.ndarray, packed: bool = False):
        if packed:
            x = embed_obs_packed(image, direction)
        else:
            x = embed_obs(image, direction).astype(jnp.bfloat16)
        x = nn.Dense(self.hidden, dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden, dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        logits = nn.Dense(self.num_actions, dtype=jnp.float32)(x)
        value = nn.Dense(1, dtype=jnp.float32)(x)
        return logits, jnp.squeeze(value, -1)
