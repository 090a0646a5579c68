"""Fused whole-rollout kernel (ops/fused_rollout.py) vs the XLA
``step_cached`` scan: identical inputs (initial states, reset cache, action
stream) must produce the identical trajectory — final state bit-exact,
reward/done totals equal, and the packed-obs checksum (the full-rank
observation consumption) equal.

Runs the kernel in Pallas interpret mode on the CPU backend (the TPU-compiled
kernel is covered by the RUN_TPU_PERF lane and the driver's bench run).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu as mg
from minigrid_tpu.core import obs as obs_mod
from minigrid_tpu.ops.fused_rollout import fused_rollout_core, supports_fused

STATE_FIELDS = [
    "grid",
    "contains",
    "agent_x",
    "agent_y",
    "agent_dir",
    "carrying",
    "step_count",
    "max_steps",
    "terminated",
    "truncated",
    "mission",
]


def xla_reference(env, states, cache, actions):
    """Scan of the exact semantics the kernel implements: step_cached +
    packed-obs checksum of the post-reset state."""
    num_envs = states.step_count.shape[0]

    def checksum(s):
        cells, vis = obs_mod.view_and_vis(
            s, env.agent_view_size, env.see_through_walls
        )
        return jnp.where(vis, cells, 0).sum()

    def body(carry, a):
        st, used, tr, td, cs = carry
        _, st, rew, term, trunc, used = jax.vmap(env.step_cached)(
            st, a, cache, used
        )
        cs = cs + jax.vmap(checksum)(st).sum()
        return (st, used, tr + rew.sum(), td + (term | trunc).sum(), cs), None

    init = (
        states,
        jnp.zeros((num_envs,), jnp.int32),
        jnp.float32(0),
        jnp.int32(0),
        jnp.int32(0),
    )
    (st, used, tr, td, cs), _ = jax.lax.scan(body, init, actions)
    return st, tr, td, cs, used.max()


def xla_reference_counter(env, states, seeds, actions):
    """Scan of the counter-reset semantics (ext.covers_reset): step_env +
    fresh in-place generation from the SAME counter stream the kernel runs
    (ext.reset_block is one shared shape-polymorphic trace), + the packed-obs
    checksum of the post-reset state."""
    ext = env.fused_ext

    def checksum(s):
        cells, vis = obs_mod.view_and_vis(
            s, env.agent_view_size, env.see_through_walls
        )
        return jnp.where(vis, cells, 0).sum()

    def one(s, a, sd, u):
        stepped, reward = env.step_env(s, a)
        term, trunc = stepped.terminated, stepped.truncated
        done = term | trunc
        fresh = ext.reset_state(env, sd[0], sd[1], u)
        # The kernel never threads the rng chain (rng is not compared).
        fresh = fresh.replace(rng=stepped.rng)
        new = jax.tree.map(
            lambda f, b: jnp.where(
                jnp.reshape(done, (1,) * f.ndim) if f.ndim else done, f, b
            ),
            fresh,
            stepped,
        )
        return new, reward, term, trunc, u + done.astype(jnp.int32)

    def body(carry, a):
        st, used, tr, td, cs = carry
        st, rew, term, trunc, used = jax.vmap(one)(st, a, seeds, used)
        cs = cs + jax.vmap(checksum)(st).sum()
        return (st, used, tr + rew.sum(), td + (term | trunc).sum(), cs), None

    num_envs = states.step_count.shape[0]
    init = (
        states,
        jnp.zeros((num_envs,), jnp.int32),
        jnp.float32(0),
        jnp.int32(0),
        jnp.int32(0),
    )
    (st, used, tr, td, cs), _ = jax.lax.scan(body, init, actions)
    return st, tr, td, cs, jnp.zeros((), jnp.int32)


def run_equivalence(env_id, n=1024, t=24, r=2, seed=0, **kwargs):
    env = mg.make(env_id, **kwargs)
    assert supports_fused(env), f"{env_id} should be fused-eligible"
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, n))
    actions = jax.random.randint(k3, (t, n), 0, env.num_actions, jnp.int32)

    ext = getattr(env, "fused_ext", None)
    if ext is not None and getattr(ext, "covers_reset", False):
        seeds = jax.random.bits(k2, (n, 2), jnp.uint32).astype(jnp.int32)
        final, tr, td, cs, max_used = fused_rollout_core(
            env, states, None, actions, True, True, seeds  # interpret=True
        )
        st_ref, tr_r, td_r, cs_r, mu_r = jax.jit(
            xla_reference_counter, static_argnums=0
        )(env, states, seeds, actions)
    else:
        cache = env.batch_reset_cache(k2, n, r)
        final, tr, td, cs, max_used = fused_rollout_core(
            env, states, cache, actions, True, True  # interpret=True
        )
        st_ref, tr_r, td_r, cs_r, mu_r = jax.jit(xla_reference, static_argnums=0)(
            env, states, cache, actions
        )

    for name in STATE_FIELDS:
        a = np.asarray(getattr(final, name))
        b = np.asarray(getattr(st_ref, name))
        np.testing.assert_array_equal(a, b, err_msg=f"{env_id}: {name}")
    if st_ref.extra is not None:
        # fused_ext families must round-trip extra bit-exactly through the
        # kernel's packed scalar/plane carry (incl. the auto-reset blends).
        ref_leaves, treedef = jax.tree.flatten(st_ref.extra)
        got_leaves, got_treedef = jax.tree.flatten(final.extra)
        assert treedef == got_treedef, f"{env_id}: extra tree structure"
        for i, (a, b) in enumerate(zip(got_leaves, ref_leaves)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{env_id}: extra leaf {i}"
            )
    assert int(td) == int(td_r), f"{env_id}: done count"
    assert int(cs) == int(cs_r), f"{env_id}: obs checksum"
    assert int(max_used) == int(mu_r), f"{env_id}: max cache slots consumed"
    np.testing.assert_allclose(float(tr), float(tr_r), rtol=1e-5)
    return int(td_r)


def test_fused_empty_with_truncation_resets():
    # Short max_steps forces truncation + cache resets past slot R-1.
    done = run_equivalence("MiniGrid-Empty-8x8-v0", t=24, max_steps=7)
    assert done > 0


def test_fused_empty_random_terminations():
    # 5x5 random starts: random walks reach the goal (terminations + reward).
    done = run_equivalence("MiniGrid-Empty-Random-5x5-v0", t=24, max_steps=9)
    assert done > 0


def test_fused_doorkey_interactions_and_occlusion():
    # see_through_walls=False exercises the in-kernel occlusion flood;
    # key pickup/drop/door toggles exercise the interaction writes.
    run_equivalence("MiniGrid-DoorKey-5x5-v0", t=24, seed=3)


def test_fused_lavacrossing():
    run_equivalence("MiniGrid-LavaCrossingS9N1-v0", t=16, seed=1)


def test_fused_fourrooms_large_grid_block():
    # 19x19 = 361 cells exercises the 1024-env (E2=1) block path and the
    # raised VMEM budget (fused_rollout_core's block-size choice); short
    # max_steps forces truncation resets through the cache.
    done = run_equivalence("MiniGrid-FourRooms-v0", t=12, max_steps=10, seed=5)
    assert done > 0


def test_rollout_random_fused_flag_dispatch():
    # On CPU, fused="auto" must fall back to the XLA path (and still run).
    from minigrid_tpu.parallel.vector import fused_eligible, rollout_random

    env = mg.make("MiniGrid-Empty-5x5-v0")
    assert not fused_eligible(env, 1024)  # cpu backend in tests
    key = jax.random.PRNGKey(0)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, 64))
    states, total_r, total_done, _ = rollout_random(env, states, key, 8)
    assert states.step_count.shape == (64,)


# -- fused_ext families (ops/fused_ext.py): _map_action/_post_step twins ------


def test_fused_ext_fetch():
    # Any pickup terminates; reward only on target match.  Short max_steps
    # forces truncation resets, blending extra (target) from the cache.
    done = run_equivalence("MiniGrid-Fetch-5x5-N2-v0", t=12, max_steps=8, seed=7)
    assert done > 0


def test_fused_ext_gotoobject():
    run_equivalence("MiniGrid-GoToObject-6x6-N2-v0", t=12, max_steps=8, seed=2)


def test_fused_ext_gotodoor():
    run_equivalence("MiniGrid-GoToDoor-5x5-v0", t=12, max_steps=8, seed=4)


def test_fused_ext_putnear():
    run_equivalence("MiniGrid-PutNear-6x6-N2-v0", t=16, max_steps=9, seed=6)


def test_fused_ext_keycorridor():
    run_equivalence("MiniGrid-KeyCorridorS3R1-v0", t=12, max_steps=10, seed=1)


def test_fused_ext_unlock():
    run_equivalence("MiniGrid-Unlock-v0", t=12, max_steps=10, seed=3)


def test_fused_ext_unlockpickup():
    run_equivalence("MiniGrid-UnlockPickup-v0", t=12, max_steps=10, seed=5)


def test_fused_ext_redbluedoors():
    run_equivalence("MiniGrid-RedBlueDoors-6x6-v0", t=12, max_steps=10, seed=8)


def test_fused_ext_dynamicobstacles():
    # The pre-step family: the in-kernel obstacle walk (counter-based
    # threefry stream, ops/prng.py) must match the XLA _pre_step draw for
    # draw — positions, grid writes, collision penalties, and the walk_seed/
    # front_not_clear carried through auto-reset blends.
    done = run_equivalence(
        "MiniGrid-Dynamic-Obstacles-5x5-v0", t=16, max_steps=9, seed=9
    )
    assert done > 0


def test_fused_ext_dynamicobstacles_8x8():
    run_equivalence("MiniGrid-Dynamic-Obstacles-8x8-v0", t=12, seed=4)


def test_fused_ext_memory_map_action():
    # MemoryEnv remaps pickup->toggle (_map_action) and terminates on the
    # success/failure hallway cells.
    run_equivalence("MiniGrid-MemoryS7-v0", t=12, max_steps=10, seed=9)


def test_fused_ext_obstructedmaze():
    run_equivalence("MiniGrid-ObstructedMaze-1Dlhb-v0", t=12, max_steps=12, seed=10)


# -- BabyAI: the verifier automaton runs in-kernel (instr_block.py) ----------


def test_fused_babyai_gotolocal():
    # GoTo leaf: goto_succ fires on facing a tracked position; successes and
    # subsequent cache resets blend the packed instr planes.
    done = run_equivalence("BabyAI-GoToLocal-v0", t=12, seed=0)
    assert done > 0


@pytest.mark.slow
def test_fused_babyai_pickup_and_open():
    # Gated lane (weekly full sweep): the Pickup/Open instr classes in the
    # random-rollout kernel; the default lane keeps GoToLocal here plus the
    # actor-kernel verifier replay (tests/test_actor_rollout.py).
    run_equivalence("BabyAI-PickupLoc-v0", t=12, seed=1)
    run_equivalence("BabyAI-OpenRedDoor-v0", t=12, seed=2)


@pytest.mark.slow
def test_fused_babyai_putnext():
    # PutNext exercises both descriptor slots, the poss dilation
    # neighborhood read and the pre_move_tracked memory (gated lane).
    run_equivalence("BabyAI-PutNextLocalS5N3-v0", t=12, seed=3)


@pytest.mark.slow
def test_fused_babyai_seq_combinators():
    # Before/After/And combinators + sticky side successes.
    run_equivalence("BabyAI-SynthSeq-v0", t=24, seed=4)


def test_fused_babyai_done_actions_mode(monkeypatch):
    # done-actions mode: statuses are swallowed until a done action reports
    # from last_match memory (verifier.py:225-237 semantics).
    monkeypatch.setenv("BABYAI_DONE_ACTIONS", "1")
    run_equivalence("BabyAI-GoToRedBallGrey-v0", t=12, seed=5)


def test_fused_babyai_maze_22x22():
    # 484-cell grid: the round-5 cap lift (fused_eligible VMEM gate replaced
    # the 19x19 WH cap).  BabyAI maze levels (GoTo/Synth*/BossLevel,
    # reference minigrid/envs/babyai/synth.py:12,388 and core/levelgen.py:33-55)
    # run the full verifier ext in-kernel at this size.
    run_equivalence("BabyAI-GoTo-v0", t=4, seed=2)


def test_fused_multiroom_25x25():
    # 625-cell grid (reference minigrid/envs/multiroom.py:112-279): the
    # largest classic level; default hooks, expensive reset via the cache.
    done = run_equivalence("MiniGrid-MultiRoom-N2-S4-v0", t=4, seed=4, max_steps=3)
    assert done > 0
