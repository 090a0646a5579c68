"""Fused actor-rollout kernel (Pallas, TPU): policy inference IN the
environment kernel.

The PPO/IMPALA collector's XLA scan pays per-step HBM round-trips three
times over — the env state carry, the packed-obs materialization, and a
tiny [N, F] policy matmul per step that cannot amortize its launch cost
(measured 62 ms of a 112 ms train step at the 8192x128 north-star config).
This kernel runs the WHOLE collection loop on-chip: for a block of 1024
envs, the grid/contains/scalars state, the reset cache AND the actor's MLP
weights are VMEM-resident; each timestep computes the packed observation
(shared view/occlusion logic from ops/fused_rollout.py), embeds it as a
one-hot feature matrix built directly in matmul layout, runs the
ActorCritic torso on the MXU, Gumbel-samples the action from the logits,
steps the environment, and auto-resets from the cache — streaming
(obs, direction, action, logp, value, reward, done) to HBM as the only
per-step traffic.

Feature layout matches rl/model.embed_obs_packed exactly (per view cell:
11 type + 6 color + 3 state one-hots, then 4 direction one-hots), with each
cell's 20 features padded to 24 rows so every cell block is sublane-aligned
(24 = 3 x 8); the weight repack in :func:`repack_actor_params` moves the
flax Dense_0 kernel into this padded layout, so logits/values agree with
the XLA ``ActorCritic.apply(..., packed=True)`` up to bf16 rounding.

Semantics = rl/rollout.collect_trajectory's reset-cache branch
(core/env.step_cached): identical transition (reference hot loop
minigrid/minigrid_env.py:525-650), auto-reset from R pre-generated levels
per env.  Action sampling is Gumbel-argmax over the 7 logits — the same
construction as jax.random.categorical, driven by the TPU core PRNG
(seeded per (block, timestep) from the caller's key).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_tpu.core.state import MISSION_DIM
from minigrid_tpu.ops.embed_dense import CELL_F, DIR_F, write_onehot
from minigrid_tpu.ops.fused_rollout import (
    NUM_SC,
    ROW_AX,
    ROW_DIR,
    ROW_MAX,
    ROW_STEP,
    ROW_TERM,
    ROW_TRUNC,
    _step_block,
    packed_view_block,
    supports_fused,
)

B = 1024  # envs per block (lane-major rows of [*, B])
NA = 7  # actions; logits+value pack into one 8-row head


def _f1(V):
    return V * V * CELL_F + DIR_F


def repack_actor_params(params, view_size: int):
    """flax ActorCritic params -> kernel weight tuple.

    Dense_0 kernel [v*v*20+4, hidden] is re-laid into the padded per-cell
    feature rows ([v*v*24 + 8, hidden], zero pad rows) and transposed so the
    kernel computes h = W1 @ OH directly; the two heads (Dense_2 logits,
    Dense_3 value) pack into one 8-row matmul.
    """
    p = params["params"]
    v2 = view_size * view_size
    w1 = p["Dense_0"]["kernel"]  # [v2*20+4, H]
    hidden = w1.shape[1]
    cells = w1[: v2 * 20].reshape(v2, 20, hidden)
    cells = jnp.pad(cells, ((0, 0), (0, CELL_F - 20), (0, 0)))
    dirs = jnp.pad(w1[v2 * 20 :], ((0, DIR_F - 4), (0, 0)))
    w1k = jnp.concatenate([cells.reshape(v2 * CELL_F, hidden), dirs], axis=0)
    w1t = w1k.T.astype(jnp.bfloat16)  # [H, F1]
    b1 = p["Dense_0"]["bias"].astype(jnp.float32).reshape(hidden, 1)
    w2t = p["Dense_1"]["kernel"].T.astype(jnp.bfloat16)  # [H, H]
    b2 = p["Dense_1"]["bias"].astype(jnp.float32).reshape(hidden, 1)
    wl = p["Dense_2"]["kernel"]  # [H, NA]
    wv = p["Dense_3"]["kernel"]  # [H, 1]
    wh = jnp.concatenate([wl, wv], axis=1).T.astype(jnp.bfloat16)  # [8, H]
    bh = jnp.concatenate(
        [p["Dense_2"]["bias"], p["Dense_3"]["bias"]]
    ).astype(jnp.float32).reshape(NA + 1, 1)
    return w1t, b1, w2t, b2, wh, bh


def _policy_block(obs_rows, d, w1t, b1, w2t, b2, wh, bh, oh_s, *, V):
    """Actor forward for one block: obs rows (list of V*V [B] packed cells) +
    direction [B] -> (logits f32[8, B] with row 7 = value).

    The one-hot feature matrix is built straight into its matmul layout
    [F1, B] by the shared builder (ops/embed_dense.write_onehot): per view
    cell a [24, B] comparison block (rows: type, color, state one-hots +
    pad) written to sublane-aligned scratch rows.
    """
    write_onehot(obs_rows, d, oh_s, V=V)

    h1 = jnp.dot(w1t, oh_s[:, :], preferred_element_type=jnp.float32) + b1
    h1 = jnp.maximum(h1, 0.0).astype(jnp.bfloat16)
    h2 = jnp.dot(w2t, h1, preferred_element_type=jnp.float32) + b2
    h2 = jnp.maximum(h2, 0.0).astype(jnp.bfloat16)
    return jnp.dot(wh, h2, preferred_element_type=jnp.float32) + bh


def _sample_block(heads, bits):
    """Gumbel-argmax over the 7 logit rows (the construction behind
    ``jax.random.categorical``); ``bits`` are int32 random bits from the
    caller's key stream — injected rather than drawn from the TPU core PRNG
    so trajectories are reproducible from the JAX key alone (and the
    interpreter, which stubs the core PRNG, stays testable).  Returns
    (action i32[B], logp f32[B], value f32[B])."""
    value = heads[NA]
    row = jax.lax.broadcasted_iota(jnp.int32, heads.shape, 0)
    neg = jnp.float32(-1e30)
    lg = jnp.where(row < NA, heads, neg)

    # Top 24 of the 32 bits -> uniform in (0, 1), then Gumbel.
    u = (((bits >> 8) & 0xFFFFFF).astype(jnp.float32) + 0.5) * (1.0 / (1 << 24))
    z = lg + -jnp.log(-jnp.log(u))

    # Manual first-max-wins argmax over the 8 sublane rows.
    best = z[0]
    action = jnp.zeros_like(best, jnp.int32)
    for k in range(1, NA):
        take = z[k] > best
        best = jnp.where(take, z[k], best)
        action = jnp.where(take, k, action)

    m = lg[0]
    for k in range(1, NA):
        m = jnp.maximum(m, lg[k])
    se = jnp.zeros_like(m)
    for k in range(NA):
        se = se + jnp.exp(lg[k] - m)
    lse = m + jnp.log(se)
    logp = jnp.zeros_like(m)
    for k in range(NA):
        logp = logp + jnp.where(action == k, lg[k] - lse, 0.0)
    return action, logp, value


def _actor_kernel(
    noise_ref,
    grid_i,
    cont_i,
    sc_i,
    mis_i,
    cgrid_ref,
    ccont_ref,
    csc_ref,
    cmis_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    wh_ref,
    bh_ref,
    obs_o,
    dir_o,
    act_o,
    logp_o,
    val_o,
    rew_o,
    done_o,
    grid_f,
    cont_f,
    sc_f,
    mis_f,
    grid_s,
    cont_s,
    sc_s,
    mis_s,
    used_s,
    oh_s,
    *,
    W,
    H,
    V,
    T,
    R,
    see_through,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        grid_s[:, :] = grid_i[0]
        cont_s[:, :] = cont_i[0]
        sc_s[:, :] = sc_i[0]
        mis_s[:, :] = mis_i[0]
        used_s[:, :] = jnp.zeros_like(used_s)

    g = grid_s[:, :]
    c = cont_s[:, :]
    sc = {r: sc_s[r] for r in range(NUM_SC)}

    # --- observation of the CURRENT state (pre-step), policy, sampling ----
    pv = packed_view_block(g, sc, W=W, H=H, V=V, see_through=see_through)
    obs_rows = [pv[i][j] for i in range(V) for j in range(V)]
    for slot, row in enumerate(obs_rows):
        obs_o[0, 0, slot] = row
    d = sc[ROW_DIR]
    dir_o[0, 0, 0] = d

    heads = _policy_block(
        obs_rows, d,
        w1_ref[:, :], b1_ref[:, :], w2_ref[:, :], b2_ref[:, :],
        wh_ref[:, :], bh_ref[:, :],
        oh_s, V=V,
    )
    action, logp, value = _sample_block(heads, noise_ref[0, 0])
    act_o[0, 0, 0] = action
    logp_o[0, 0, 0] = logp
    val_o[0, 0, 0] = value

    # --- transition + auto-reset from the cache (step_cached semantics) ---
    g, c, sc, reward, _aux = _step_block(g, c, sc, action, W=W, H=H)
    done = (sc[ROW_TERM] | sc[ROW_TRUNC]) != 0
    rew_o[0, 0, 0] = reward
    done_o[0, 0, 0] = done.astype(jnp.int32)

    used = used_s[0]
    mis = mis_s[:, :]
    fg, fc = cgrid_ref[0, 0], ccont_ref[0, 0]
    fsc = {r: csc_ref[0, 0, r] for r in range(NUM_SC)}
    fm = cmis_ref[0, 0]
    for r in range(1, R):
        take = used >= r
        fg = jnp.where(take[None], cgrid_ref[0, r], fg)
        fc = jnp.where(take[None], ccont_ref[0, r], fc)
        for q in range(NUM_SC):
            fsc[q] = jnp.where(take, csc_ref[0, r, q], fsc[q])
        fm = jnp.where(take[None], cmis_ref[0, r], fm)
    g = jnp.where(done[None], fg, g)
    c = jnp.where(done[None], fc, c)
    for q in range(NUM_SC):
        sc[q] = jnp.where(done, fsc[q], sc[q])
    mis = jnp.where(done[None], fm, mis)
    used_s[0] = used + done.astype(jnp.int32)

    grid_s[:, :] = g
    cont_s[:, :] = c
    for q in range(NUM_SC):
        sc_s[q] = sc[q]
    mis_s[:, :] = mis

    @pl.when(t == T - 1)
    def _final():
        grid_f[0] = grid_s[:, :]
        cont_f[0] = cont_s[:, :]
        sc_f[0] = sc_s[:, :]
        mis_f[0] = mis_s[:, :]


def supports_fused_actor(env, num_envs: int) -> bool:
    """Same family surface as the random-policy fused kernel plus the block
    divisibility/VMEM constraints.  Single-device only: the learners shard
    with jit+in_shardings, and XLA's SPMD partitioner cannot partition a
    custom call — multi-chip meshes fall back to the partitionable XLA scan
    (a pod deployment would instead wrap the kernel in ``shard_map`` so each
    device runs it on its local batch shard)."""
    return (
        jax.devices()[0].platform == "tpu"
        and jax.device_count() == 1
        and supports_fused(env)
        # fused_ext families are fused in the random-rollout kernel; the
        # actor kernel does not run ext hooks yet.
        and getattr(env, "fused_ext", None) is None
        and num_envs % B == 0
        and env.width * env.height <= 361
    )


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def fused_actor_rollout(
    env,
    params,
    states,
    key,
    num_steps: int,
    resets_per_chunk: int = 2,
    interpret: bool | None = None,
):
    """Collect ``num_steps`` on-policy steps with the actor in the kernel.

    Returns ``(final_states, traj_dict)`` where ``traj_dict`` has time-major
    [T, N] leaves: obs (int32 [T, N, v*v] packed), direction, action, logp,
    value, reward, done — the same contract as rl/rollout.collect_trajectory.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if interpret is True:
        # The plain CPU interpreter has no lowering for the TPU PRNG
        # primitives; the TPU-semantics interpreter does.
        interpret = pltpu.InterpretParams()
    N = states.step_count.shape[0]
    assert N % B == 0, f"fused_actor_rollout requires num_envs % {B} == 0"
    Eb = N // B
    W, H, V = env.width, env.height, env.agent_view_size
    WH = W * H
    T = int(num_steps)
    R = int(resets_per_chunk)
    F1 = _f1(V)

    k_cache, k_noise, k_rng = jax.random.split(key, 3)
    cache = env.batch_reset_cache(k_cache, N, R)
    w1t, b1, w2t, b2, wh, bh = repack_actor_params(params, V)
    hidden = w1t.shape[0]
    noise = jax.random.bits(k_noise, (Eb, T, NA + 1, B), jnp.uint32).astype(jnp.int32)

    def rows(st):
        cols = [
            st.agent_x,
            st.agent_y,
            st.agent_dir,
            st.carrying,
            st.step_count,
            st.max_steps,
            st.terminated.astype(jnp.int32),
            st.truncated.astype(jnp.int32),
        ]
        return jnp.stack(cols, axis=-1)  # [..., NUM_SC]

    def to_rows(x):
        """[N, ...rest] -> [Eb, ...rest, B] (env axis into lanes)."""
        rest = x.shape[1:]
        y = x.reshape((Eb, B) + rest)
        perm = (0,) + tuple(range(2, 2 + len(rest))) + (1,)
        return y.transpose(perm)

    grid_b = to_rows(states.grid.reshape(N, WH))
    cont_b = to_rows(states.contains.reshape(N, WH))
    sc_b = to_rows(rows(states))
    mis_b = to_rows(states.mission)
    cg = to_rows(cache.grid.reshape(N, R, WH))
    cc = to_rows(cache.contains.reshape(N, R, WH))
    csc = to_rows(rows(cache))
    cm = to_rows(cache.mission)

    def spec(*shape, index=None):
        if index is None:
            index = lambda e, t: (e,) + (0,) * len(shape)
        return pl.BlockSpec((1,) + shape, index, memory_space=pltpu.VMEM)

    def wspec(*shape):
        return pl.BlockSpec(shape, lambda e, t: (0,) * len(shape), memory_space=pltpu.VMEM)

    def tspec(*shape):
        return pl.BlockSpec(
            (1, 1) + shape, lambda e, t: (e, t) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    kernel = partial(
        _actor_kernel,
        W=W, H=H, V=V, T=T, R=R, see_through=bool(env.see_through_walls),
    )
    # Per-step row outputs carry a singleton axis so the block's trailing
    # two dims (1, B) equal the array dims (TPU BlockSpec tiling rule).
    out_shapes = [
        jax.ShapeDtypeStruct((Eb, T, V * V, B), jnp.int32),  # obs rows
        jax.ShapeDtypeStruct((Eb, T, 1, B), jnp.int32),  # direction
        jax.ShapeDtypeStruct((Eb, T, 1, B), jnp.int32),  # action
        jax.ShapeDtypeStruct((Eb, T, 1, B), jnp.float32),  # logp
        jax.ShapeDtypeStruct((Eb, T, 1, B), jnp.float32),  # value
        jax.ShapeDtypeStruct((Eb, T, 1, B), jnp.float32),  # reward
        jax.ShapeDtypeStruct((Eb, T, 1, B), jnp.int32),  # done
        jax.ShapeDtypeStruct((Eb, WH, B), jnp.int32),  # final grid
        jax.ShapeDtypeStruct((Eb, WH, B), jnp.int32),  # final contains
        jax.ShapeDtypeStruct((Eb, NUM_SC, B), jnp.int32),  # final scalars
        jax.ShapeDtypeStruct((Eb, MISSION_DIM, B), jnp.int32),  # final mission
    ]
    vmem_limit = max(
        16 * 1024 * 1024,
        int((2 + 2 * R) * WH * B * 4 * 3.2) + F1 * B * 2 * 2 + 8 * 1024 * 1024,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(Eb, T),
        in_specs=[
            tspec(NA + 1, B),  # sampling noise bits
            spec(WH, B),
            spec(WH, B),
            spec(NUM_SC, B),
            spec(MISSION_DIM, B),
            spec(R, WH, B),
            spec(R, WH, B),
            spec(R, NUM_SC, B),
            spec(R, MISSION_DIM, B),
            wspec(hidden, F1),
            wspec(hidden, 1),
            wspec(hidden, hidden),
            wspec(hidden, 1),
            wspec(NA + 1, hidden),
            wspec(NA + 1, 1),
        ],
        out_specs=[
            tspec(V * V, B),
            tspec(1, B),
            tspec(1, B),
            tspec(1, B),
            tspec(1, B),
            tspec(1, B),
            tspec(1, B),
            spec(WH, B),
            spec(WH, B),
            spec(NUM_SC, B),
            spec(MISSION_DIM, B),
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((WH, B), jnp.int32),
            pltpu.VMEM((WH, B), jnp.int32),
            pltpu.VMEM((NUM_SC, B), jnp.int32),
            pltpu.VMEM((MISSION_DIM, B), jnp.int32),
            pltpu.VMEM((1, B), jnp.int32),
            pltpu.VMEM((F1, B), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(noise, grid_b, cont_b, sc_b, mis_b, cg, cc, csc, cm, w1t, b1, w2t, b2, wh, bh)

    (obs_o, dir_o, act_o, logp_o, val_o, rew_o, done_o,
     grid_f, cont_f, sc_f, mis_f) = outs

    def from_rows(x):
        """[Eb, ...rest, B] -> [N, ...rest]."""
        nrest = x.ndim - 2
        perm = (0, x.ndim - 1) + tuple(range(1, 1 + nrest))
        return x.transpose(perm).reshape((N,) + x.shape[1:-1])

    sc_out = from_rows(sc_f)  # [N, NUM_SC]
    final = states.replace(
        grid=from_rows(grid_f).reshape(N, W, H),
        contains=from_rows(cont_f).reshape(N, W, H),
        agent_x=sc_out[:, 0],
        agent_y=sc_out[:, 1],
        agent_dir=sc_out[:, 2],
        carrying=sc_out[:, 3],
        step_count=sc_out[:, ROW_STEP],
        max_steps=sc_out[:, ROW_MAX],
        terminated=sc_out[:, ROW_TERM] != 0,
        truncated=sc_out[:, ROW_TRUNC] != 0,
        mission=from_rows(mis_f),
        rng=jax.vmap(jax.random.fold_in, (None, 0))(k_rng, jnp.arange(N)),
    )

    def tmajor(x):
        """[Eb, T, ...rest, B] -> [T, N, ...rest]."""
        nrest = x.ndim - 3
        perm = (1, 0, x.ndim - 1) + tuple(range(2, 2 + nrest))
        return x.transpose(perm).reshape((T, N) + x.shape[2:-1])

    def trow(x):  # [Eb, T, 1, B] -> [T, N]
        return tmajor(x)[..., 0]

    traj = {
        "obs": tmajor(obs_o),
        "direction": trow(dir_o),
        "action": trow(act_o),
        "logp": trow(logp_o),
        "value": trow(val_o),
        "reward": trow(rew_o),
        "done": trow(done_o) != 0,
    }
    return final, traj
