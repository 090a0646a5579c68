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
per env.  Action sampling is Gumbel-argmax over the ``num_actions`` logits
— the same construction as jax.random.categorical — from injected random
bits keyed per (block, timestep).

Family hooks: ``fused_ext`` publishers (ops/fused_ext.py — all BabyAI
levels' verifier, Dynamic-Obstacles' walk, KeyCorridor/PutNear/... reward
shaping) run INSIDE the kernel exactly as in the random-rollout kernel:
pre_step before the core transition, map_action on the sampled action
(the trajectory stores the ORIGINAL action, as the XLA collector does),
post_step on the transition context; the ext's packed scalars/planes stay
VMEM-resident and blend on auto-reset.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_tpu.ops.embed_dense import CELL_F, DIR_F, write_onehot
from minigrid_tpu.ops.fused_ext import FusedCtx
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
# Head rows: num_actions logits + 1 value, zero-padded to a full 8-row
# sublane block (num_actions <= 7 across the zoo; Dynamic-Obstacles has 3).
HEAD_ROWS = 8


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
    wl = p["Dense_2"]["kernel"]  # [H, num_actions]
    wv = p["Dense_3"]["kernel"]  # [H, 1]
    na = wl.shape[1]
    wh = jnp.concatenate([wl, wv], axis=1).T.astype(jnp.bfloat16)  # [na+1, H]
    bh = jnp.concatenate(
        [p["Dense_2"]["bias"], p["Dense_3"]["bias"]]
    ).astype(jnp.float32).reshape(na + 1, 1)
    # Zero-pad the head to HEAD_ROWS sublanes; row ``na`` stays the value.
    wh = jnp.pad(wh, ((0, HEAD_ROWS - na - 1), (0, 0)))
    bh = jnp.pad(bh, ((0, HEAD_ROWS - na - 1), (0, 0)))
    return w1t, b1, w2t, b2, wh, bh


def _policy_block(obs_rows, d, w1t, b1, w2t, b2, wh, bh, oh_s, *, V):
    """Actor forward for one block: obs rows (list of V*V [B] packed cells) +
    direction [B] -> heads f32[HEAD_ROWS, B] (rows 0..na-1 = logits, row na
    = value, rest zero-padded).

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


def _sample_block(heads, bits, na):
    """Gumbel-argmax over the ``na`` logit rows (the construction behind
    ``jax.random.categorical``); ``bits`` are int32 random bits from the
    caller's key stream — injected rather than drawn from the TPU core PRNG
    so trajectories are reproducible from the JAX key alone (and the
    interpreter, which stubs the core PRNG, stays testable).  Returns
    (action i32[B], logp f32[B], value f32[B])."""
    value = heads[na]
    row = jax.lax.broadcasted_iota(jnp.int32, heads.shape, 0)
    neg = jnp.float32(-1e30)
    lg = jnp.where(row < na, heads, neg)

    # Top 24 of the 32 bits -> uniform in (0, 1), then Gumbel.
    u = (((bits >> 8) & 0xFFFFFF).astype(jnp.float32) + 0.5) * (1.0 / (1 << 24))
    z = lg + -jnp.log(-jnp.log(u))

    # Manual first-max-wins argmax over the logit sublane rows.
    best = z[0]
    action = jnp.zeros_like(best, jnp.int32)
    for k in range(1, na):
        take = z[k] > best
        best = jnp.where(take, z[k], best)
        action = jnp.where(take, k, action)

    m = lg[0]
    for k in range(1, na):
        m = jnp.maximum(m, lg[k])
    se = jnp.zeros_like(m)
    for k in range(na):
        se = se + jnp.exp(lg[k] - m)
    lse = m + jnp.log(se)
    logp = jnp.zeros_like(m)
    for k in range(na):
        logp = logp + jnp.where(action == k, lg[k] - lse, 0.0)
    return action, logp, value


def _actor_kernel(
    *refs,
    W,
    H,
    V,
    TC,
    TB,
    R,
    K,
    P,
    NA,
    see_through,
    env,
    ext,
    no_obj=False,
    static_mis=False,
    counter_reset=False,
):
    it = iter(refs)
    noise_ref = next(it)
    grid_i, cont_i, sc_i, mis_i = next(it), next(it), next(it), next(it)
    scal_i = next(it) if K else None
    pl_i = next(it) if P else None
    if counter_reset:
        seeds_ref = next(it)
        cgrid_ref = ccont_ref = csc_ref = cmis_ref = None
        cscal_ref = cpl_ref = None
    else:
        cgrid_ref, ccont_ref, csc_ref, cmis_ref = (
            next(it), next(it), next(it), next(it),
        )
        cscal_ref = next(it) if K else None
        cpl_ref = next(it) if P else None
    w1_ref, b1_ref, w2_ref, b2_ref, wh_ref, bh_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it),
    )
    obs_o, dir_o, act_o, logp_o, val_o, rew_o, done_o = (
        next(it), next(it), next(it), next(it), next(it), next(it), next(it),
    )
    grid_f, cont_f, sc_f, mis_f = next(it), next(it), next(it), next(it)
    scal_f = next(it) if K else None
    pl_f = next(it) if P else None
    grid_s, cont_s, sc_s, mis_s = next(it), next(it), next(it), next(it)
    scal_s = next(it) if K else None
    pl_s = next(it) if P else None
    used_s, oh_s = next(it), next(it)

    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _init():
        grid_s[:, :] = grid_i[0]
        cont_s[:, :] = cont_i[0]
        sc_s[:, :] = sc_i[0]
        mis_s[:, :] = mis_i[0]
        used_s[:, :] = jnp.zeros_like(used_s)
        if K:
            scal_s[:, :] = scal_i[0]
        if P:
            pl_s[:, :, :] = pl_i[0]

    # Scratch state loads/stores bracket the WHOLE TC-step loop: the
    # per-invocation fixed cost (grid launch, scratch round trip) amortizes
    # over TC timesteps — the dominant non-matmul share of the rollout phase
    # at TC=1 (grid=(Eb, T) was 1024 launches per collection at the
    # north-star config; see STATUS round 5).
    g = grid_s[:, :]
    c = cont_s[:, :]
    sc = {r: sc_s[r] for r in range(NUM_SC)}
    scal = tuple(scal_s[k] for k in range(K))
    planes = tuple(pl_s[p] for p in range(P))
    used = used_s[0]
    mis = mis_s[:, :]

    for kt in range(TC):
        # --- observation of the CURRENT state, policy, sampling -----------
        # The policy observes the state BEFORE the transition — including
        # before any family pre-step dynamics, exactly like the XLA
        # collector (observation precedes step_env's _pre_step call,
        # core/env.py:112-121).
        pv = packed_view_block(g, sc, W=W, H=H, V=V, see_through=see_through)
        obs_rows = [pv[i][j] for i in range(V) for j in range(V)]
        for slot, row in enumerate(obs_rows):
            obs_o[0, kt, slot] = row
        d = sc[ROW_DIR]
        dir_o[0, kt, 0] = d

        heads = _policy_block(
            obs_rows, d,
            w1_ref[:, :], b1_ref[:, :], w2_ref[:, :], b2_ref[:, :],
            wh_ref[:, :], bh_ref[:, :],
            oh_s, V=V,
        )
        action, logp, value = _sample_block(heads, noise_ref[0, kt], NA)
        act_o[0, kt, 0] = action
        logp_o[0, kt, 0] = logp
        val_o[0, kt, 0] = value

        # --- transition + auto-reset (step_cached semantics) --------------
        if ext is not None:
            # Pre-action dynamics (e.g. the Dynamic-Obstacles walk) — the
            # same hook order as the random-rollout kernel and step_env.
            g, c, sc, scal, planes = ext.pre_step(
                env, W, H, g, c, sc, scal, planes, action
            )
        g_prev, sc_prev = g, sc
        mapped = ext.map_action(env, action) if ext is not None else action
        g, c, sc, reward, aux = _step_block(
            g, c, sc, mapped, W=W, H=H, no_objects=no_obj
        )
        if ext is not None:
            fmask, fcell_prev, fcell_post = aux
            ctx = FusedCtx(
                env=env,
                W=W,
                H=H,
                g_prev=g_prev,
                g_post=g,
                c=c,
                sc_prev=sc_prev,
                sc=sc,
                fmask=fmask,
                fcell_prev=fcell_prev,
                fcell_post=fcell_post,
                action=action,
                reward=reward,
                scal=scal,
                planes=planes,
            )
            term_x, reward, scal, planes = ext.post_step(ctx)
            sc[ROW_TERM] = sc[ROW_TERM] | term_x.astype(jnp.int32)
        done = (sc[ROW_TERM] | sc[ROW_TRUNC]) != 0
        rew_o[0, kt, 0] = reward
        done_o[0, kt, 0] = done.astype(jnp.int32)

        # no_obj / static_mis: the contains plane and the mission vector are
        # reset-blend identities for flagged families (core/env.py
        # capability contract) — their blends are statically skipped.
        if counter_reset:
            # In-kernel fresh-episode generation from the counter stream
            # (ext.covers_reset): the reference's fresh-reset contract at
            # any episode rate — no cache, no covering-R sizing.
            fg, fc, fsc, fm, fscal, fpl = ext.reset_block(
                env, W, H, seeds_ref[0, 0], seeds_ref[0, 1], used
            )
            fc = fc if not no_obj else None
            fm = fm if not static_mis else None
            fscal = list(fscal)
            fpl = list(fpl)
        else:
            fg = cgrid_ref[0, 0]
            fc = ccont_ref[0, 0] if not no_obj else None
            fsc = {r: csc_ref[0, 0, r] for r in range(NUM_SC)}
            fm = cmis_ref[0, 0] if not static_mis else None
            fscal = [cscal_ref[0, 0, k] for k in range(K)]
            fpl = [cpl_ref[0, 0, p] for p in range(P)]
            for r in range(1, R):
                take = used >= r
                fg = jnp.where(take[None], cgrid_ref[0, r], fg)
                if not no_obj:
                    fc = jnp.where(take[None], ccont_ref[0, r], fc)
                for q in range(NUM_SC):
                    fsc[q] = jnp.where(take, csc_ref[0, r, q], fsc[q])
                if not static_mis:
                    fm = jnp.where(take[None], cmis_ref[0, r], fm)
                for k in range(K):
                    fscal[k] = jnp.where(take, cscal_ref[0, r, k], fscal[k])
                for p in range(P):
                    fpl[p] = jnp.where(take[None], cpl_ref[0, r, p], fpl[p])
        g = jnp.where(done[None], fg, g)
        for q in range(NUM_SC):
            sc[q] = jnp.where(done, fsc[q], sc[q])
        scal = tuple(jnp.where(done, fscal[k], scal[k]) for k in range(K))
        planes = tuple(
            jnp.where(done[None], fpl[p], planes[p]) for p in range(P)
        )
        used = used + done.astype(jnp.int32)
        if not no_obj:
            c = jnp.where(done[None], fc, c)
        if not static_mis:
            mis = jnp.where(done[None], fm, mis)

    used_s[0] = used
    grid_s[:, :] = g
    if not no_obj:
        cont_s[:, :] = c
    for q in range(NUM_SC):
        sc_s[q] = sc[q]
    if not static_mis:
        mis_s[:, :] = mis
    for k in range(K):
        scal_s[k] = scal[k]
    for p in range(P):
        pl_s[p] = planes[p]

    @pl.when(tb == TB - 1)
    def _final():
        grid_f[0] = grid_s[:, :]
        cont_f[0] = cont_s[:, :]
        sc_f[0] = sc_s[:, :]
        mis_f[0] = mis_s[:, :]
        if K:
            scal_f[0] = scal_s[:, :]
        if P:
            pl_f[0] = pl_s[:, :, :]


def actor_vmem_estimate(env, resets_per_chunk: int) -> int:
    """Bytes of VMEM one kernel block needs (mirrors the vmem_limit
    computation in :func:`fused_actor_rollout`): live planes + R-slot reset
    cache, the bf16 one-hot scratch, and buffering headroom."""
    ext = getattr(env, "fused_ext", None)
    planes = ext.n_planes if ext is not None else 0
    if ext is not None and getattr(ext, "covers_reset", False):
        resets_per_chunk = 0  # in-kernel generation: no cache resident
    wh = env.width * env.height
    return (
        int((2 + planes) * (1 + resets_per_chunk) * wh * B * 4 * 3.2)
        + _f1(env.agent_view_size) * B * 2 * 2
        + 8 * 1024 * 1024
    )


def supports_fused_actor(env, num_envs: int, resets_per_chunk: int = 2) -> bool:
    """Same family surface as the random-policy fused kernel (default-hook
    families AND ``fused_ext`` publishers — the kernel runs the ext's
    pre/map/post hooks and carries its packed scalars/planes in VMEM) plus
    the block divisibility/VMEM constraints (grid + R-slot cache per block
    against the v5e's 128 MB physical VMEM).  Single-device only: the
    learners shard with jit+in_shardings, and XLA's SPMD partitioner cannot
    partition a custom call — multi-chip meshes instead reach the kernel
    through the ``shard_map`` path in rl/rollout.py (each device runs it on
    its local batch shard)."""
    return (
        jax.devices()[0].platform == "tpu"
        and jax.device_count() == 1
        and supports_fused(env)
        and num_envs % B == 0
        and env.width * env.height <= 625
        and actor_vmem_estimate(env, resets_per_chunk) <= 100 * 1024 * 1024
    )


@partial(jax.jit, static_argnums=(0, 4, 5, 6, 7))
def fused_actor_rollout(
    env,
    params,
    states,
    key,
    num_steps: int,
    resets_per_chunk: int = 2,
    interpret: bool | None = None,
    time_chunk: int | None = None,
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
    # Timesteps per kernel invocation.  A TC>1 "launch amortization" default
    # was tried (grid=(Eb, T) is 1024 grid steps per collection) and MEASURED
    # SLOWER on the v5e: Pallas grid steps run inside ONE launch with
    # double-buffered output windows, so there is no per-step launch cost to
    # amortize, and larger time blocks only coarsen the pipelining (Empty-8x8
    # collect 152.5M sps at TC=1 vs 91.6M at TC=8; GoToLocal 31.3M vs 26.8M
    # at TC=4).  Default is therefore 1; ``time_chunk`` stays for the
    # chunk-equivalence test that pins TC-invariant trajectories.
    if time_chunk is not None:
        desired_tc = int(time_chunk)
    else:
        desired_tc = 1
    TC = 1
    for cand in range(desired_tc, 0, -1):
        if T % cand == 0:
            TC = cand
            break
    TB = T // TC
    F1 = _f1(V)
    na = int(env.num_actions)
    # Mission width varies by family (classic 8, BabyAI 44); structural dim.
    MISSION_DIM = states.mission.shape[-1]
    ext = getattr(env, "fused_ext", None)
    K = ext.n_scalars if ext is not None else 0
    P = ext.n_planes if ext is not None else 0

    counter_reset = bool(ext is not None and getattr(ext, "covers_reset", False))
    k_cache, k_noise, k_rng = jax.random.split(key, 3)
    if counter_reset:
        cache = None
        seeds = jax.random.bits(k_cache, (N, 2), jnp.uint32).astype(jnp.int32)
        R = 0
    else:
        cache = env.batch_reset_cache(k_cache, N, R)
        seeds = None
    w1t, b1, w2t, b2, wh, bh = repack_actor_params(params, V)
    hidden = w1t.shape[0]
    noise = jax.random.bits(k_noise, (Eb, T, HEAD_ROWS, B), jnp.uint32).astype(jnp.int32)

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

    # Family-ext extra state, packed to int32 scalars/planes (fused_ext.py),
    # env axis into lanes: [Eb, K, B] / [Eb, P, WH, B] (+ R-slot caches).
    if ext is not None and (K or P):
        scal_N, pl_N = ext.pack_extra(env, states.extra)  # [N, K], [N, P, WH]
        scal_b = to_rows(scal_N) if K else None
        pl_b = to_rows(pl_N) if P else None
    else:
        scal_b = pl_b = None
    if counter_reset:
        seeds_b = to_rows(seeds)  # [Eb, 2, B]
        cg = cc = csc = cm = cscal_b = cpl_b = None
    else:
        seeds_b = None
        cg = to_rows(cache.grid.reshape(N, R, WH))
        cc = to_rows(cache.contains.reshape(N, R, WH))
        csc = to_rows(rows(cache))
        cm = to_rows(cache.mission)
        if ext is not None and (K or P):
            cscal_N, cpl_N = ext.pack_extra(env, cache.extra)
            cscal_b = to_rows(cscal_N) if K else None
            cpl_b = to_rows(cpl_N) if P else None
        else:
            cscal_b = cpl_b = None

    def spec(*shape, index=None):
        if index is None:
            index = lambda e, tb: (e,) + (0,) * len(shape)
        return pl.BlockSpec((1,) + shape, index, memory_space=pltpu.VMEM)

    def wspec(*shape):
        return pl.BlockSpec(shape, lambda e, tb: (0,) * len(shape), memory_space=pltpu.VMEM)

    def tspec(*shape):
        # One (1, TC)-deep time block per invocation: TC timesteps' rows
        # stream out per kernel launch (the launch-amortization lever).
        return pl.BlockSpec(
            (1, TC) + shape, lambda e, tb: (e, tb) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    kernel = partial(
        _actor_kernel,
        W=W, H=H, V=V, TC=TC, TB=TB, R=R, K=K, P=P, NA=na,
        see_through=bool(env.see_through_walls), env=env, ext=ext,
        no_obj=bool(getattr(env, "fused_no_objects", False)),
        static_mis=bool(getattr(env, "fused_static_mission", False)),
        counter_reset=counter_reset,
    )

    def maybe(x):
        return [x] if x is not None else []

    # Per-step row outputs carry a singleton axis so the block's trailing
    # two dims (1, B) equal the array dims (TPU BlockSpec tiling rule).
    out_shapes = (
        [
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
        + ([jax.ShapeDtypeStruct((Eb, K, B), jnp.int32)] if K else [])
        + ([jax.ShapeDtypeStruct((Eb, P, WH, B), jnp.int32)] if P else [])
    )
    vmem_limit = max(
        16 * 1024 * 1024,
        int((2 + P) * (1 + R) * WH * B * 4 * 3.2)
        + F1 * B * 2 * 2
        + 8 * 1024 * 1024,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(Eb, TB),
        in_specs=(
            [
                tspec(HEAD_ROWS, B),  # sampling noise bits
                spec(WH, B),
                spec(WH, B),
                spec(NUM_SC, B),
                spec(MISSION_DIM, B),
            ]
            + ([spec(K, B)] if K else [])
            + ([spec(P, WH, B)] if P else [])
            + (
                [spec(2, B)]
                if counter_reset
                else [
                    spec(R, WH, B),
                    spec(R, WH, B),
                    spec(R, NUM_SC, B),
                    spec(R, MISSION_DIM, B),
                ]
                + ([spec(R, K, B)] if K else [])
                + ([spec(R, P, WH, B)] if P else [])
            )
            + [
                wspec(hidden, F1),
                wspec(hidden, 1),
                wspec(hidden, hidden),
                wspec(hidden, 1),
                wspec(HEAD_ROWS, hidden),
                wspec(HEAD_ROWS, 1),
            ]
        ),
        out_specs=(
            [
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
            ]
            + ([spec(K, B)] if K else [])
            + ([spec(P, WH, B)] if P else [])
        ),
        out_shape=out_shapes,
        scratch_shapes=(
            [
                pltpu.VMEM((WH, B), jnp.int32),
                pltpu.VMEM((WH, B), jnp.int32),
                pltpu.VMEM((NUM_SC, B), jnp.int32),
                pltpu.VMEM((MISSION_DIM, B), jnp.int32),
            ]
            + ([pltpu.VMEM((K, B), jnp.int32)] if K else [])
            + ([pltpu.VMEM((P, WH, B), jnp.int32)] if P else [])
            + [
                pltpu.VMEM((1, B), jnp.int32),
                pltpu.VMEM((F1, B), jnp.bfloat16),
            ]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(
        *(
            [noise, grid_b, cont_b, sc_b, mis_b]
            + maybe(scal_b)
            + maybe(pl_b)
            + (
                [seeds_b]
                if counter_reset
                else [cg, cc, csc, cm] + maybe(cscal_b) + maybe(cpl_b)
            )
            + [w1t, b1, w2t, b2, wh, bh]
        )
    )

    (obs_o, dir_o, act_o, logp_o, val_o, rew_o, done_o,
     grid_f, cont_f, sc_f, mis_f) = outs[:11]
    rest = list(outs[11:])
    scal_f = rest.pop(0) if K else None
    pl_f = rest.pop(0) if P else None

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
    if ext is not None and (K or P):
        final = final.replace(
            extra=ext.unpack_extra(
                env,
                from_rows(scal_f) if K else None,  # [N, K]
                from_rows(pl_f) if P else None,  # [N, P, WH]
            )
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
