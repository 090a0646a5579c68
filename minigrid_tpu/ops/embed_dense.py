"""Fused one-hot embed + first dense layer (Pallas, TPU) with custom VJP.

The PPO/IMPALA update's activation-bandwidth hot spot is the one-hot
feature tensor: [M, 984] bf16 per minibatch (~258 MB at the north-star
config) is materialized by the embed, read by the first matmul, and read
AGAIN by the backward dW matmul — ~6 GB of HBM traffic per update
(measured: the update ran at 19.3 ms vs a ~10 ms MXU roofline,
tools/profiler.py ppo-breakdown).  This kernel builds the one-hot matrix
directly in VMEM in its matmul layout ([F1, BM] — features on sublanes,
samples on lanes, each view cell's 20 features padded to 24 sublane rows,
the same layout the fused actor kernel uses) and performs the dense-1
matmul in place; only the packed int32 observation (26 MB) and the [M, H]
activations ever touch HBM.  The backward pass rebuilds the one-hots per
block (cheaper than storing them) and accumulates dW/db across the
sequential TPU grid.

Feature semantics are EXACTLY rl/model.embed_obs_packed -> Dense_0
(per cell: 11 type + 6 color + 3 state one-hots, cells major, then 4
direction one-hots); parameters are the unmodified flax Dense_0 kernel/
bias, padded/unpadded on the fly (the pad rows carry zero activations, so
their gradients are identically zero and are dropped on unpad).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_tpu.core.constants import NUM_COLORS, NUM_OBJECTS

CELL_F = 24  # per-cell one-hot rows, NUM_OBJECTS+NUM_COLORS+3 = 20 padded to 24
DIR_F = 8  # direction one-hot rows (4 padded to 8)
BM = 1024  # preferred samples per block (lanes-major)


def _block(M: int) -> int:
    for b in (BM, 512, 256, 128):
        if M % b == 0:
            return b
    raise ValueError(f"embed_dense1 needs num_samples % 128 == 0 (got {M})")


def feat_rows(V: int) -> int:
    """Padded feature rows F1 for view size V."""
    return V * V * CELL_F + DIR_F


def write_onehot(obs_rows, d, oh_s, *, V):
    """Write the one-hot feature matrix into scratch ``oh_s`` [F1, B].

    ``obs_rows``: V*V packed int32 [B] cell vectors (lanes-major);
    ``d``: int32 [B] direction.  Per cell a [CELL_F, B] comparison block
    (rows: type, color, state one-hots + zero pad) lands on sublane-aligned
    scratch rows; shared by the fused actor kernel (ops/actor_rollout.py)
    and the embed+dense1 update kernel below.
    """
    f = jax.lax.broadcasted_iota(jnp.int32, (CELL_F, 1), 0)
    t_tgt = f
    c_tgt = f - NUM_OBJECTS
    s_tgt = f - NUM_OBJECTS - NUM_COLORS
    for slot, pv in enumerate(obs_rows):
        t = (pv & 0xFF)[None, :]  # [1, B]
        c = ((pv >> 8) & 0xFF)[None, :]
        s = jnp.clip((pv >> 16) & 0xFF, 0, 2)[None, :]
        val = jnp.where(
            f < NUM_OBJECTS, t, jnp.where(f < NUM_OBJECTS + NUM_COLORS, c, s)
        )
        tgt = jnp.where(
            f < NUM_OBJECTS, t_tgt, jnp.where(f < NUM_OBJECTS + NUM_COLORS, c_tgt, s_tgt)
        )
        oh = ((val == tgt) & (f < NUM_OBJECTS + NUM_COLORS + 3)).astype(jnp.bfloat16)
        oh_s[pl.ds(slot * CELL_F, CELL_F), :] = oh
    fd = jax.lax.broadcasted_iota(jnp.int32, (DIR_F, 1), 0)
    oh_s[pl.ds(V * V * CELL_F, DIR_F), :] = (fd == d[None, :]).astype(jnp.bfloat16)


def pad_w1(w1, V: int):
    """flax Dense_0 kernel [V*V*20 + 4, H] -> padded [F1, H] bf16 (zero pad
    rows interleaved per cell + after the direction rows)."""
    v2 = V * V
    hidden = w1.shape[1]
    cells = w1[: v2 * 20].reshape(v2, 20, hidden)
    cells = jnp.pad(cells, ((0, 0), (0, CELL_F - 20), (0, 0)))
    dirs = jnp.pad(w1[v2 * 20 :], ((0, DIR_F - 4), (0, 0)))
    return jnp.concatenate(
        [cells.reshape(v2 * CELL_F, hidden), dirs], axis=0
    ).astype(jnp.bfloat16)


def unpad_dw1(dwp, V: int):
    """Inverse row selection of :func:`pad_w1` on the gradient [F1, H]."""
    v2 = V * V
    hidden = dwp.shape[1]
    cells = dwp[: v2 * CELL_F].reshape(v2, CELL_F, hidden)[:, :20]
    dirs = dwp[v2 * CELL_F : v2 * CELL_F + 4]
    return jnp.concatenate([cells.reshape(v2 * 20, hidden), dirs], axis=0)


def _fwd_kernel(obs_ref, dir_ref, w1_ref, b1_ref, out_ref, oh_s, *, V):
    obs_rows = [obs_ref[i] for i in range(V * V)]
    write_onehot(obs_rows, dir_ref[0], oh_s, V=V)
    h = jax.lax.dot_general(
        oh_s[:, :],
        w1_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :] = h.astype(jnp.bfloat16) + b1_ref[0, :][None, :]


def _bwd_kernel(obs_ref, dir_ref, dy_ref, dw_ref, db_ref, oh_s, *, V):
    j = pl.program_id(0)
    obs_rows = [obs_ref[i] for i in range(V * V)]
    write_onehot(obs_rows, dir_ref[0], oh_s, V=V)
    dy = dy_ref[:, :]
    contrib = jax.lax.dot_general(
        oh_s[:, :],
        dy,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbc = jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(j == 0)
    def _init():
        dw_ref[:, :] = contrib
        db_ref[:, :] = dbc

    @pl.when(j > 0)
    def _acc():
        dw_ref[:, :] = dw_ref[:, :] + contrib
        db_ref[:, :] = db_ref[:, :] + dbc


def supports_embed_dense1(num_samples: int) -> bool:
    return (
        jax.devices()[0].platform == "tpu"
        and num_samples % 128 == 0
    )


@partial(jax.jit, static_argnums=(4, 5))
def _fwd(w1, b1, packed, direction, V: int, interpret: bool):
    M = packed.shape[0]
    F1 = feat_rows(V)
    hidden = w1.shape[1]
    bm = _block(M)
    obs_t = packed.T  # [v2, M] int32 — 26 MB vs the 258 MB feature tensor
    dir_t = direction.reshape(1, M)
    w1p = pad_w1(w1, V)
    b1b = b1.astype(jnp.bfloat16).reshape(1, hidden)
    return pl.pallas_call(
        partial(_fwd_kernel, V=V),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((V * V, bm), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((F1, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, hidden), lambda j: (j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, hidden), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((F1, bm), jnp.bfloat16)],
        interpret=interpret,
    )(obs_t, dir_t, w1p, b1b)


@partial(jax.jit, static_argnums=(3, 4))
def _bwd(packed, direction, dy, V: int, interpret: bool):
    M = packed.shape[0]
    F1 = feat_rows(V)
    hidden = dy.shape[1]
    bm = _block(M)
    obs_t = packed.T
    dir_t = direction.reshape(1, M)
    dwp, db = pl.pallas_call(
        partial(_bwd_kernel, V=V),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((V * V, bm), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, hidden), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((F1, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((F1, bm), jnp.bfloat16)],
        interpret=interpret,
    )(obs_t, dir_t, dy)
    return unpad_dw1(dwp, V), db.reshape(hidden)


def embed_dense1(w1, b1, packed, direction, V: int, interpret: bool = False):
    """bf16[M, H] = onehot(packed, direction) @ w1 + b1, fused in VMEM.

    ``packed`` int32[M, V*V], ``direction`` int32[M]; ``w1``/``b1`` the flax
    Dense_0 parameters (f32).  Differentiable in (w1, b1); the backward
    rebuilds the one-hots per block instead of saving the feature tensor.
    Bit-compatible with embed_obs_packed -> Dense(bf16) up to bf16 rounding
    (equivalence-tested in tests/test_embed_dense.py).
    """

    @jax.custom_vjp
    def f(w1, b1):
        return _fwd(w1, b1, packed, direction, V, interpret)

    def f_fwd(w1, b1):
        return f(w1, b1), None

    def f_bwd(_, dy):
        dw1, db1 = _bwd(packed, direction, dy, V, interpret)
        return dw1.astype(w1.dtype), db1.astype(b1.dtype)

    f.defvjp(f_fwd, f_bwd)
    return f(w1, b1)
