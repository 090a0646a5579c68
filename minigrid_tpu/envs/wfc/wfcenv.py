"""WFC environment (reference: minigrid/envs/wfc/wfcenv.py:30-258)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import GOAL_CELL, WALL_CELL
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import rand_dir, sample_mask_cell
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.envs.wfc.preprocess import WFC_PRESETS, WFCConfig, preset_tables, build_tables
from minigrid_tpu.envs.wfc.solver import wfc_solve

_MISSION = register_mission("traverse the maze to get to the goal")


def _largest_component(nav: jnp.ndarray) -> jnp.ndarray:
    """Keep only the largest 4-connected navigable component (of size > 1),
    the reference's graph-based filtering (wfcenv.py:216-245) as label
    propagation + bincount."""
    w, h = nav.shape
    big = jnp.int32(w * h + 7)
    lab = jnp.where(nav, jnp.arange(w * h, dtype=jnp.int32).reshape(w, h), big)

    def body(_, lab):
        p = jnp.pad(lab, 1, constant_values=w * h + 7)
        m = jnp.minimum(
            jnp.minimum(p[2:, 1:-1], p[:-2, 1:-1]),
            jnp.minimum(p[1:-1, 2:], p[1:-1, :-2]),
        )
        return jnp.where(nav, jnp.minimum(lab, m), lab)

    lab = jax.lax.fori_loop(0, (w * h) // 2 + 2, body, lab)
    counts = (
        jnp.zeros((w * h + 8,), jnp.int32).at[lab.reshape(-1)].add(nav.reshape(-1))
    )
    counts = counts.at[w * h + 7].set(0)
    counts = jnp.where(counts > 1, counts, 0)  # drop singleton components
    best = jnp.argmax(counts)
    return nav & (lab == best)


class WFCEnv(MiniGridEnv):
    """Level generation via Wave Function Collapse from B/W pattern images
    (reference: minigrid/envs/wfc/wfcenv.py:114-258)."""

    expensive_reset = True

    def __init__(
        self,
        wfc_config: str | WFCConfig = "MazeSimple",
        size: int = 25,
        ensure_connected: bool = True,
        max_steps: int | None = None,
        max_attempts: int = 64,
        **kwargs,
    ):
        if size < 3:
            raise ValueError(f"Grid size must be at least 3 (currently {size})")
        if max_steps is None:
            max_steps = size * 20
        super().__init__(width=size, height=size, max_steps=max_steps, **kwargs)
        self.config = (
            wfc_config if isinstance(wfc_config, WFCConfig) else WFC_PRESETS[wfc_config]
        )
        tables = (
            build_tables(self.config)
            if isinstance(wfc_config, WFCConfig)
            else preset_tables(wfc_config)
        )
        self._tables = tables
        self.ensure_connected = ensure_connected
        self.max_attempts = max_attempts

    def _generate(self, key: jax.Array) -> EnvState:
        w = h = self.width
        inner = w - 2
        t = self._tables
        k_solve, k_start, k_goal, k_dir, k_carry = jax.random.split(key, 5)

        pattern_grid, ok = wfc_solve(
            k_solve,
            jnp.asarray(t["adj"]),
            jnp.asarray(t["weights"]),
            jnp.zeros((inner, inner)),
            periodic=self.config.output_periodic,
            max_attempts=self.max_attempts,
            loc_heuristic=self.config.loc_heuristic,
            choice_heuristic=self.config.choice_heuristic,
            backtracking=self.config.backtracking,
        )
        # Pattern anchor tile -> wall/empty (reference wfcenv.py:203-214).
        is_wall_pattern = jnp.asarray(t["top_left"] == t["wall_tile"])
        wall = is_wall_pattern[pattern_grid]  # [inner, inner]
        nav = ~wall
        if self.ensure_connected:
            nav = _largest_component(nav)

        # Start and goal: two distinct navigable cells (reference :247-258).
        start = sample_mask_cell(k_start, nav)
        xs, ys = g.coord_grids(inner, inner)
        nav2 = nav & ~((xs == start[0]) & (ys == start[1]))
        goal = sample_mask_cell(k_goal, nav2)

        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)
        interior_wall = jnp.pad(~nav, 1, constant_values=False)
        grid = g.put(grid, interior_wall, WALL_CELL)
        grid = g.set_cell(grid, goal[0] + 1, goal[1] + 1, GOAL_CELL)

        return new_state(
            grid=grid,
            agent_pos=start + 1,
            agent_dir=rand_dir(k_dir),
            rng=k_carry,
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
        )

    def mission_text(self, mission=None) -> str:
        return "traverse the maze to get to the goal"


def make_log_stats():
    """TSV stats logger mirroring the reference's make_log_stats
    (control.py:44-60): first call writes a header line, every call appends
    one tab-separated row."""
    log_line = 0

    def log_stats(stats: dict, filename: str) -> None:
        nonlocal log_line
        if stats:
            log_line += 1
            with open(filename, "a", encoding="utf_8") as logf:
                if log_line < 2:
                    print("\t".join(str(k) for k in stats), file=logf)
                print("\t".join(str(v) for v in stats.values()), file=logf)

    return log_stats


def execute_wfc(
    key,
    config: WFCConfig,
    output_size: tuple[int, int] = (25, 25),
    max_attempts: int = 10,
    log_filename: str | None = None,
    log_stats_to_output=None,
    on_choice=None,
    on_observe=None,
    on_propagate=None,
    on_backtrack=None,
):
    """Host-side solve orchestration with per-run stats, mirroring the
    reference's execute_wfc (control.py:63-294): returns
    (pattern_grid | None, stats).  The stats dict carries the input
    parameters plus attempt/collapse/backtrack/contradiction counters and
    the solve duration; pass ``log_stats_to_output=make_log_stats()`` (and a
    filename) for the reference's TSV logging behavior."""
    import time

    t = build_tables(config)
    stats: dict = {
        "pattern": config.pattern,
        "pattern_width": config.pattern_width,
        "rotations": config.rotations,
        "output_size": output_size,
        "attempt_limit": max_attempts,
        "output_periodic": config.output_periodic,
        "input_periodic": config.input_periodic,
        "location heuristic": config.loc_heuristic,
        "choice heuristic": config.choice_heuristic,
        "backtracking": config.backtracking,
        "pattern count": int(t["patterns"].shape[0]),
    }
    t0 = time.perf_counter()
    grid, ok, run_stats = wfc_solve(
        key,
        jnp.asarray(t["adj"]),
        jnp.asarray(t["weights"]),
        jnp.zeros(output_size),
        periodic=config.output_periodic,
        max_attempts=max_attempts,
        loc_heuristic=config.loc_heuristic,
        choice_heuristic=config.choice_heuristic,
        backtracking=config.backtracking,
        with_stats=True,
        on_choice=on_choice,
        on_observe=on_observe,
        on_propagate=on_propagate,
        on_backtrack=on_backtrack,
    )
    ok = bool(ok)
    stats.update({k: int(v) for k, v in run_stats.items()})
    stats["solve duration"] = time.perf_counter() - t0
    stats["outcome"] = "success" if ok else "contradiction"
    if log_stats_to_output is not None and log_filename is not None:
        log_stats_to_output(stats, log_filename)
    return (jax.device_get(grid) if ok else None), stats
