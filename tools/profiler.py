"""One parameterized profiler entry point for every tracked surface.

Consolidates the round-1/2 scratch scripts (perf_engine/perf_obs*/
perf_babyai*/perf_kc*/perf_ppo/perf_multi/perf_hlo/perf_round2) into one
auditable tool.  Run on the machine with the TPU attached:

    python tools/profiler.py rollout --env MiniGrid-Empty-8x8-v0
    python tools/profiler.py rollout --env MiniGrid-FourRooms-v0 --no-fused
    python tools/profiler.py obs --env MiniGrid-Empty-8x8-v0
    python tools/profiler.py ppo                 # single-dispatch + marginal
    python tools/profiler.py wfc --preset MazeSimple
    python tools/profiler.py rtt                 # tunnel dispatch overhead
    python tools/profiler.py trend               # refresh tools/perf_trend.json

Measurement rules (single host core, tunneled TPU): one TPU process at a
time, best-of-N to reject tunnel stalls (up to 2x drift run-to-run —
tools/perf_interleave.py), and the tunnel adds a fixed ~25-35 ms
dispatch+fetch cost per call (measure it with ``rtt``), so per-call times
for sub-50ms work are dominated by it — prefer marginal costs from scanned
repetitions (the ``ppo`` mode prints both).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Runnable as `python tools/profiler.py` from anywhere: the repo root (the
# minigrid_tpu package parent) is not sys.path[0] when the script lives in
# tools/.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(fn, *args, reps: int = 5):
    import jax

    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def rollout_sps(env_id: str, num_envs: int, num_steps: int, fused: bool | str = "auto"):
    """Raw random-policy rollout steps/s (the bench.py headline shape)."""
    import jax

    import minigrid_tpu as mg
    from minigrid_tpu.parallel.vector import rollout_random

    env = mg.make(env_id)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, num_envs))
    t = _bench(lambda k: rollout_random(env, states, k, num_steps, 2, fused), k2)
    return num_envs * num_steps / t


def obs_sps(env_id: str, num_envs: int, num_steps: int, fused: bool = True):
    """Obs-consumed rollout steps/s via the fused kernel when eligible
    (falls back to the XLA scan); every obs element feeds the checksum.
    ``fused=False`` forces the XLA scan path — the number every non-TPU
    platform and any unfused family gets."""
    import jax
    import jax.numpy as jnp

    import minigrid_tpu as mg
    from minigrid_tpu.parallel.vector import fused_eligible

    env = mg.make(env_id)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, num_envs))
    if fused and fused_eligible(env, num_envs):
        from minigrid_tpu.ops.fused_rollout import fused_rollout

        t = _bench(lambda k: fused_rollout(env, states, k, num_steps, 2, True), k2)
        return num_envs * num_steps / t

    obs_batch = jax.vmap(env.observation)

    @jax.jit
    def roll(states, k):
        def body(carry, _):
            st, kk, acc = carry
            kk, ka = jax.random.split(kk)
            a = jax.random.randint(ka, (num_envs,), 0, env.num_actions, jnp.int32)
            _, st, *_ = jax.vmap(env.step)(st, a)
            return (st, kk, acc + obs_batch(st)["image"].astype(jnp.int32).sum()), None

        (st, _, acc), _ = jax.lax.scan(body, (states, k, jnp.int32(0)), None, length=num_steps)
        return acc

    t = _bench(lambda k: roll(states, k), k2)
    return num_envs * num_steps / t


def ppo_times(num_envs: int = 8192, rollout_steps: int = 128):
    """(single_dispatch_s, marginal_s) per train step at the north-star
    config.  The marginal cost comes from scanned-update differencing
    ((t(8)-t(4))/4) — the per-update cost of a real training run, free of
    the tunnel's fixed dispatch overhead."""
    import jax

    import minigrid_tpu as mg
    from minigrid_tpu.rl.ppo import PPOConfig, make_ppo

    env = mg.make("MiniGrid-Empty-8x8-v0")
    init_fn, train_step = make_ppo(env, PPOConfig(rollout_steps=rollout_steps))
    state = init_fn(jax.random.PRNGKey(11), num_envs)

    step = jax.jit(train_step)
    t1 = _bench(lambda s: step(s)[1]["pg_loss"], state, reps=3)

    def multi(k):
        @jax.jit
        def run(s):
            def body(ss, _):
                ss, m = train_step(ss)
                return ss, m["pg_loss"]

            ss, losses = jax.lax.scan(body, s, None, length=k)
            return losses.sum()

        return run

    t4 = _bench(multi(4), state, reps=3)
    t8 = _bench(multi(8), state, reps=3)
    return t1, (t8 - t4) / 4


def ppo_breakdown(num_envs: int = 8192, rollout_steps: int = 128):
    """Marginal per-phase times (seconds) of one PPO train step at the
    north-star config: rollout (fused actor kernel), update (GAE + 8
    minibatches), and the whole step — each from scanned differencing
    ((t(8)-t(4))/4) so the tunnel's fixed dispatch cost cancels."""
    import jax
    import jax.numpy as jnp

    import minigrid_tpu as mg
    from minigrid_tpu.rl.ppo import PPOConfig, make_ppo

    env = mg.make("MiniGrid-Empty-8x8-v0")
    init_fn, train_step = make_ppo(env, PPOConfig(rollout_steps=rollout_steps))
    state = init_fn(jax.random.PRNGKey(11), num_envs)

    def marginal(step_fn, init_carry):
        def multi(k):
            @jax.jit
            def run(c):
                def body(cc, _):
                    cc, out = step_fn(cc)
                    return cc, out

                cc, outs = jax.lax.scan(body, c, None, length=k)
                return jax.tree.map(
                    lambda x: x.sum() if hasattr(x, "sum") else x, outs
                )

            return run

        t4 = _bench(multi(4), init_carry, reps=3)
        t8 = _bench(multi(8), init_carry, reps=3)
        return (t8 - t4) / 4

    def roll_step(carry):
        env_states, key = carry
        env_states, key, traj = train_step.rollout(
            state.params, env_states, key
        )
        return (env_states, key), traj.logp.sum()

    t_roll = marginal(roll_step, (state.env_states, state.key))

    # One real trajectory to feed the update phase repeatedly.
    env_states, key, traj = jax.jit(
        lambda s: train_step.rollout(s.params, s.env_states, s.key)
    )(state)

    def upd_step(carry):
        params, opt_state, k = carry
        params, opt_state, k, metrics = train_step.update(
            params, opt_state, k, env_states, traj
        )
        return (params, opt_state, k), metrics["pg_loss"]

    t_upd = marginal(upd_step, (state.params, state.opt_state, key))

    def full_step(carry):
        carry, m = jax.jit(train_step)(carry)
        return carry, m["pg_loss"]

    t_full = marginal(full_step, state)
    return {
        "rollout_s": t_roll,
        "update_s": t_upd,
        "full_s": t_full,
        "sps_full": num_envs * rollout_steps / t_full,
        "sps_if_rollout_only": num_envs * rollout_steps / t_roll,
        "sps_if_update_only": num_envs * rollout_steps / t_upd,
    }


def wfc_levels_per_sec(preset: str = "MazeSimple", batch: int = 64):
    import jax
    import jax.numpy as jnp

    from minigrid_tpu.envs.wfc.preprocess import preset_tables
    from minigrid_tpu.envs.wfc.solver import wfc_solve

    t = preset_tables(preset)
    adj, w = jnp.asarray(t["adj"]), jnp.asarray(t["weights"])
    solve = jax.jit(
        jax.vmap(lambda k: wfc_solve(k, adj, w, jnp.zeros((23, 23)), periodic=False, max_attempts=64))
    )
    tt = _bench(lambda k: solve(jax.random.split(k, batch)), jax.random.PRNGKey(3), reps=3)
    return batch / tt


def tunnel_rtt():
    """Fixed per-dispatch overhead of the axon tunnel: time a trivial
    computation and the same computation chained x8; the intercept is RTT."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128), jnp.float32)
    f1 = jax.jit(lambda x: (x * 1.0001).sum())

    @jax.jit
    def f8(x):
        def body(c, _):
            return c * 1.0001, None

        c, _ = jax.lax.scan(body, x, None, length=8)
        return c.sum()

    t1, t8 = _bench(f1, x), _bench(f8, x)
    return max(t1 - (t8 - t1) / 7, 0.0)


TREND_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "perf_trend.json")
TREND_HISTORY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "perf_trend_history.json"
)

_N, _T = 65536, 256

# Every floor metric, table-driven: key -> zero-arg measure fn.  This is the
# SINGLE source of truth for the regression lane — tests/test_perf_tpu.py
# parameterizes over these keys, so adding a metric here automatically floors
# it (round-3 verdict weak #2: only 5 of ~13 tracked metrics had floors, and
# LavaCrossing slipped -2.7% unwatched).
TREND_METRICS = {
    "empty8x8_rollout_sps": lambda: rollout_sps("MiniGrid-Empty-8x8-v0", _N, _T),
    "empty5x5_rollout_sps": lambda: rollout_sps("MiniGrid-Empty-5x5-v0", _N, _T),
    "empty_random5x5_rollout_sps": lambda: rollout_sps(
        "MiniGrid-Empty-Random-5x5-v0", _N, _T
    ),
    "obs_consumed_sps": lambda: obs_sps("MiniGrid-Empty-8x8-v0", _N, _T),
    "obs_consumed_xla_sps": lambda: obs_sps(
        "MiniGrid-Empty-8x8-v0", _N, _T, fused=False
    ),
    "doorkey8x8_rollout_sps": lambda: rollout_sps("MiniGrid-DoorKey-8x8-v0", _N, _T),
    "fourrooms_rollout_sps": lambda: rollout_sps("MiniGrid-FourRooms-v0", _N, _T),
    "lavacrossing_s9n2_rollout_sps": lambda: rollout_sps(
        "MiniGrid-LavaCrossingS9N2-v0", _N, _T
    ),
    "dynamic_obstacles8x8_rollout_sps": lambda: rollout_sps(
        "MiniGrid-Dynamic-Obstacles-8x8-v0", _N, _T
    ),
    "babyai_gotolocal_rollout_sps": lambda: rollout_sps(
        "BabyAI-GoToLocal-v0", 16384, _T
    ),
    "obstructed_maze_2dlh_rollout_sps": lambda: rollout_sps(
        "MiniGrid-ObstructedMaze-2Dlh-v0", 8192, _T
    ),
    "wfc_mazesimple_levels_per_sec": lambda: wfc_levels_per_sec(),
}


def refresh_trend():
    """Re-measure every floor metric and rewrite tools/perf_trend.json (the
    source of tests/test_perf_tpu.py's trend-based regression floors), and
    append the snapshot to perf_trend_history.json (the source of the
    docs/content/performance.md round-over-round table)."""
    out = {}
    for key, fn in TREND_METRICS.items():
        out[key] = round(fn(), 2 if "levels" in key else None)
    t1, marg = ppo_times()
    out["ppo_sps_single_dispatch"] = round(8192 * 128 / t1)
    out["ppo_sps_marginal"] = round(8192 * 128 / marg)
    with open(TREND_PATH, "w") as f:
        json.dump(out, f, indent=1)
    history = []
    if os.path.exists(TREND_HISTORY_PATH):
        with open(TREND_HISTORY_PATH) as f:
            history = json.load(f)
    history.append(out)
    with open(TREND_HISTORY_PATH, "w") as f:
        json.dump(history, f, indent=1)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "mode",
        choices=["rollout", "obs", "ppo", "ppo-breakdown", "wfc", "rtt", "trend"],
    )
    ap.add_argument("--env", default="MiniGrid-Empty-8x8-v0")
    ap.add_argument("--num-envs", type=int, default=65536)
    ap.add_argument("--num-steps", type=int, default=256)
    ap.add_argument("--preset", default="MazeSimple")
    ap.add_argument("--no-fused", action="store_true")
    args = ap.parse_args()

    if args.mode == "rollout":
        sps = rollout_sps(
            args.env, args.num_envs, args.num_steps,
            False if args.no_fused else "auto",
        )
        print(f"{args.env}: {sps/1e6:.1f}M steps/s")
    elif args.mode == "obs":
        sps = obs_sps(args.env, args.num_envs, args.num_steps)
        print(f"{args.env} obs-consumed: {sps/1e6:.1f}M steps/s")
    elif args.mode == "ppo":
        t1, marg = ppo_times()
        print(
            f"single dispatch {t1*1e3:.1f} ms ({8192*128/t1/1e6:.1f}M steps/s); "
            f"marginal {marg*1e3:.1f} ms ({8192*128/marg/1e6:.1f}M steps/s)"
        )
    elif args.mode == "ppo-breakdown":
        b = ppo_breakdown()
        print(
            f"rollout {b['rollout_s']*1e3:.1f} ms "
            f"({b['sps_if_rollout_only']/1e6:.1f}M sps) | "
            f"update {b['update_s']*1e3:.1f} ms "
            f"({b['sps_if_update_only']/1e6:.1f}M sps) | "
            f"full {b['full_s']*1e3:.1f} ms ({b['sps_full']/1e6:.1f}M sps)"
        )
    elif args.mode == "wfc":
        print(f"{args.preset}: {wfc_levels_per_sec(args.preset):.1f} levels/s")
    elif args.mode == "rtt":
        print(f"tunnel RTT ~{tunnel_rtt()*1e3:.1f} ms per dispatch+fetch")
    elif args.mode == "trend":
        print(json.dumps(refresh_trend(), indent=1))


if __name__ == "__main__":
    main()
