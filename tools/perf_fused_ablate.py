"""Ablate the fused rollout kernel's per-iteration overhead sources.

Variants of a stripped kernel (Empty-8x8 shapes, N=65536, T=256):
  v0: step only, actions read per-t from ref, cond blend
  v1: v0 but actions preloaded into a VMEM value once
  v2: v1 but blend unconditional (no lax.cond)
  v3: v1 but NO blend at all
  v4: v1 + obs checksum (full kernel compute path)
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_fused_ablate.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import minigrid_tpu as mg
from minigrid_tpu.ops import fused_rollout as fr

N, T, R = 65536, 256, 2
E2 = 2
B = E2 * 1024
Eb = N // B
W = H = 8
WH = 64
S = (E2, 8, 128)

env = mg.make("MiniGrid-Empty-8x8-v0")
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
_, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, N))
cache = env.batch_reset_cache(k2, N, R)
actions = jax.random.randint(k3, (T, N), 0, env.num_actions, jnp.int32)


def make_kernel(preload_actions, blend_mode, obs):
    # blend_mode: "cond" | "always" | "none"
    def kernel(actions_ref, grid_i, cont_i, sc_i, cgrid_ref, ccont_ref, csc_ref,
               grid_o, sc_o, acc_o):
        g0 = grid_i[0]
        c0 = cont_i[0]
        sc0 = tuple(sc_i[0, r] for r in range(fr.NUM_SC))
        def body(t, st):
            g, c, sc_t, used, acc = st
            sc = {r: sc_t[r] for r in range(fr.NUM_SC)}
            action = actions_ref[0, t]
            g, c, sc, reward = fr._step_block(g, c, sc, action, W=W, H=H)
            done = (sc[fr.ROW_TERM] | sc[fr.ROW_TRUNC]) != 0
            acc = acc + reward

            def blend(args):
                g, c, sc_t, used = args
                sc = {r: sc_t[r] for r in range(fr.NUM_SC)}
                fg, fc = cgrid_ref[0, 0], ccont_ref[0, 0]
                fsc = {r: csc_ref[0, 0, r] for r in range(fr.NUM_SC)}
                for r in range(1, R):
                    take = used >= r
                    fg = jnp.where(take[None], cgrid_ref[0, r], fg)
                    fc = jnp.where(take[None], ccont_ref[0, r], fc)
                    for q in range(fr.NUM_SC):
                        fsc[q] = jnp.where(take, csc_ref[0, r, q], fsc[q])
                g = jnp.where(done[None], fg, g)
                c = jnp.where(done[None], fc, c)
                sc2 = tuple(jnp.where(done, fsc[q], sc[q]) for q in range(fr.NUM_SC))
                return g, c, sc2

            sc_t = tuple(sc[r] for r in range(fr.NUM_SC))
            if blend_mode == "cond":
                g, c, sc_t = jax.lax.cond(
                    jnp.any(done), blend, lambda a: (a[0], a[1], a[2]),
                    (g, c, sc_t, used))
            elif blend_mode == "always":
                g, c, sc_t = blend((g, c, sc_t, used))
            used = used + done.astype(jnp.int32)
            if obs:
                sc = {r: sc_t[r] for r in range(fr.NUM_SC)}
                ochk = fr._obs_checksum_block(g, sc, W=W, H=H, V=7, see_through=True)
                acc = acc + ochk.astype(jnp.float32)
            return (g, c, sc_t, used, acc)

        zero = jnp.zeros(S, jnp.int32)
        init = (g0, c0, sc0, zero, jnp.zeros(S, jnp.float32))
        g, c, sc_t, used, acc = jax.lax.fori_loop(0, T, body, init)
        grid_o[0] = g
        for r in range(fr.NUM_SC):
            sc_o[0, r] = sc_t[r]
        acc_o[0] = acc

    return kernel


def run_variant(name, preload, blend_mode, obs):
    def sc_of(st):
        return jnp.stack([st.agent_x, st.agent_y, st.agent_dir, st.carrying,
                          st.step_count, st.max_steps,
                          st.terminated.astype(jnp.int32),
                          st.truncated.astype(jnp.int32)], axis=-1)

    grid_b = fr._to_env_tiles(states.grid.reshape(N, WH), Eb, E2)
    cont_b = fr._to_env_tiles(states.contains.reshape(N, WH), Eb, E2)
    sc_b = fr._to_env_tiles(sc_of(states), Eb, E2)
    cg = fr._to_env_tiles(cache.grid.reshape(N, R, WH), Eb, E2)
    cc = fr._to_env_tiles(cache.contains.reshape(N, R, WH), Eb, E2)
    csc = fr._to_env_tiles(sc_of(cache), Eb, E2)

    def spec(*shape):
        return pl.BlockSpec((1,) + shape, lambda e: (e,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def go(acts):
        act_b = acts.reshape(T, Eb, E2, 8, 128).transpose(1, 0, 2, 3, 4)
        return pl.pallas_call(
            make_kernel(preload, blend_mode, obs),
            grid=(Eb,),
            in_specs=[spec(T, *S), spec(WH, *S), spec(WH, *S), spec(fr.NUM_SC, *S),
                      spec(R, WH, *S), spec(R, WH, *S), spec(R, fr.NUM_SC, *S)],
            out_specs=[spec(WH, *S), spec(fr.NUM_SC, *S), spec(*S)],
            out_shape=[jax.ShapeDtypeStruct((Eb, WH) + S, jnp.int32),
                       jax.ShapeDtypeStruct((Eb, fr.NUM_SC) + S, jnp.int32),
                       jax.ShapeDtypeStruct((Eb,) + S, jnp.float32)],
        )(act_b, grid_b, cont_b, sc_b, cg, cc, csc)

    out = go(actions)
    jax.block_until_ready(out)
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        out = go(actions)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {N*T/best/1e6:8.1f} M steps/s  ({best/T*1e6:6.1f} us/step-batch)", flush=True)


run_variant("v0 cond blend, no obs", False, "cond", False)
run_variant("v1 ALWAYS blend, no obs", False, "always", False)
run_variant("v2 NO blend, no obs", False, "none", False)
run_variant("v3 cond blend, + obs", False, "cond", True)
run_variant("v4 NO blend, + obs", False, "none", True)
