"""Counter-based per-env PRNG usable INSIDE Pallas kernels.

The fused rollout kernel (ops/fused_rollout.py) deliberately does not thread
the ``jax.random`` key-split chain through its step loop — splitting is a
host-level threefry construction the kernel cannot cheaply reproduce.
Families whose dynamics draw randomness *during* a step (Dynamic-Obstacles'
obstacle walk, reference minigrid/envs/dynamicobstacles.py:144-156) instead
consume a COUNTER-BASED stream: ``threefry2x32(seed, (step_count, i))``,
where the seed is two int32 words fixed at episode generation.

The implementation below is the standard Threefry-2x32 block cipher with 20
rounds (Salmon et al., "Parallel Random Numbers: As Easy as 1, 2, 3",
SC'11) written in plain ``jnp`` elementwise ops — add/xor/rotate on uint32 —
so the SAME function traces into the Pallas kernel (VPU elementwise on
(8, 128) lane tiles) and into the XLA ``_pre_step`` path.  Bit-exact
fused-vs-XLA equivalence is therefore by construction, not by careful
mirroring.  Verified against the Random123 known-answer vectors in
tests/test_pallas_ops.py.
"""

from __future__ import annotations

import jax.numpy as jnp

# Threefry-2x32 rotation schedule (Random123 reference implementation).
_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = 0x1BD11BDA


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32-20 block cipher: key (k0, k1), counter (x0, x1) ->
    two independent uniform 32-bit words.

    Inputs may be any int32/uint32 arrays (broadcastable); computation is in
    uint32 (wrapping adds) and the outputs are uint32.
    """
    ks0 = jnp.asarray(k0).astype(jnp.uint32)
    ks1 = jnp.asarray(k1).astype(jnp.uint32)
    ks2 = ks0 ^ ks1 ^ jnp.uint32(_PARITY)
    x0 = jnp.asarray(x0).astype(jnp.uint32) + ks0
    x1 = jnp.asarray(x1).astype(jnp.uint32) + ks1

    ks = (ks1, ks2, ks0)
    for block in range(5):
        rots = _ROTATIONS[:4] if block % 2 == 0 else _ROTATIONS[4:]
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[block % 3]
        x1 = x1 + ks[(block + 1) % 3] + jnp.uint32(block + 1)
    return x0, x1


def uniform_index(bits, count):
    """Map one uniform 32-bit word to an integer in [0, count) without a
    32-bit modulo: take the top 24 bits and multiply-shift.  Exactly uniform
    up to 2^-24 granularity (count here is <= a few hundred) and int32-only,
    so it lowers to cheap VPU ops inside kernels.

    ``bits`` uint32, ``count`` int32 (>0); broadcastable.  Returns int32.
    """
    u24 = (jnp.asarray(bits) >> jnp.uint32(8)).astype(jnp.int32)
    return (u24 * jnp.asarray(count, jnp.int32)) >> 24
