"""Device-side Wave Function Collapse solver.

The reference's hot loop is a numpy fixed-point of adjacency matmuls with a
Python observe/collapse driver (reference: minigrid/envs/wfc/wfclogic/
solver.py:421-529).  That shape is already MXU-native: here the whole solve —
constraint propagation, location/pattern heuristics, collapse, backtracking,
contradiction restart — runs as one jitted ``while_loop`` program, with the
(P, P) @ (P, W*H) support products on the matrix unit.

Feature parity with the reference solver:

* Location heuristics (solver.py:167-305): ``entropy``, ``anti-entropy``,
  ``random``, ``simple``, ``lexical``, ``spiral``, ``hilbert``.  All reduce
  to an arg-extreme over a per-cell score, so each is one vectorized select;
  the spiral/hilbert cell orders are precomputed host-side at trace time.
* Pattern heuristics (solver.py:316-406): ``weighted``, ``random``,
  ``lexical``, ``rarest``, ``most-common``.  NOTE the reference's rarest/
  most-common pick from *global* pattern-possibility counts without masking
  by the chosen cell's domain (solver.py:384-406) — an illegal pick then
  contradicts during propagation; mirrored as-is.
* Backtracking (reference Solver, solver.py:37-112): the reference pushes a
  wave snapshot at every ``solve_next`` entry and, on contradiction, pops and
  bans the just-made choice.  Since each pop retrieves the entry pushed by
  the *same* iteration, entries below the stack top are unreachable — a
  single snapshot reproduces the exact semantics in O(1) memory.  The
  reference's entry-time ``propagate`` sits *outside* its try block
  (solver.py:85-87), so a contradiction caused by a ban aborts the whole
  attempt rather than backtracking further; mirrored.
* Per-attempt stats (control.py:230-283): collapse/backtrack/contradiction
  counters and the attempt count are accumulated on device and returned when
  ``with_stats=True`` (see ``execute_wfc`` in wfcenv.py for the host-side
  stats dict + TSV logging mirroring control.py:44-105).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LOC_HEURISTICS = (
    "entropy",
    "anti-entropy",
    "random",
    "simple",
    "lexical",
    "spiral",
    "hilbert",
)
CHOICE_HEURISTICS = ("weighted", "random", "lexical", "rarest", "most-common")


def _spiral_order(w: int, h: int) -> np.ndarray:
    """Cell-visit order of the reference's square spiral from the center
    (solver.py:212-240): for each ring, one step then N steps down / left /
    N up / right, alternating.  Out-of-range coordinates: negative indices
    wrap (numpy indexing), too-large ones are skipped — both mirrored.
    Returns float order values in [0, 1); unvisited cells keep 2.0."""
    order = np.full((w, h), 2.0)
    total = w * h
    fill = 0

    def visit(x, y):
        nonlocal fill
        if fill >= total:
            return
        if x >= w or y >= h or x < -w or y < -h:
            return
        order[x, y] = fill / total
        fill += 1

    x, y = w // 2, h // 2
    visit(x, y)
    n = 1
    while fill < total and n < 4 * (w + h):
        if n % 2 == 0:
            steps = [(0, 1)] + [(1, 0)] * n + [(0, -1)] * n
        else:
            steps = [(0, -1)] + [(-1, 0)] * n + [(0, 1)] * n
        for dx, dy in steps:
            x += dx
            y += dy
            visit(x, y)
        n += 1
    return order


def _hilbert_order(w: int, h: int) -> np.ndarray:
    """Hilbert-curve visit order (reference solver.py:276-295; it hardcodes a
    16x16 curve regardless of grid size — cells beyond the curve keep their
    random preference values, mirrored by returning 2.0 there)."""
    side = 16  # curve_size = 4 iterations, 2**4 per side (solver.py:283)
    order = np.full((w, h), 2.0)
    total = w * h

    def d2xy(n, d):
        # Standard Hilbert d->(x, y) (public-domain algorithm).
        rx = ry = 0
        x = y = 0
        t = d
        s = 1
        while s < n:
            rx = 1 & (t // 2)
            ry = 1 & (t ^ rx)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            x += s * rx
            y += s * ry
            t //= 4
            s *= 2
        return x, y

    fill = 0
    for d in range(side * side):
        x, y = d2xy(side, d)
        if x < w and y < h and fill < total:
            order[x, y] = fill / total
            fill += 1
    return order


def _propagate(wave, adj, periodic: bool):
    """Fixed point of support constraints (reference solver.py:421-483)."""
    P, W, H = wave.shape

    def supports(wave):
        if periodic:
            padded = jnp.pad(wave, ((0, 0), (1, 1), (1, 1)), mode="wrap")
        else:
            padded = jnp.pad(
                wave, ((0, 0), (1, 1), (1, 1)), constant_values=True
            )
        new = wave
        for di, (dx, dy) in enumerate(((0, -1), (1, 0), (0, 1), (-1, 0))):
            shifted = padded[:, 1 + dx : 1 + W + dx, 1 + dy : 1 + H + dy]
            sup = (
                jnp.dot(
                    adj[di].astype(jnp.float32),
                    shifted.reshape(P, -1).astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
                > 0
            ).reshape(P, W, H)
            new = new & sup
        return new

    def cond(carry):
        wave, last = carry
        return wave.sum() != last

    def body(carry):
        wave, _ = carry
        return supports(wave), wave.sum()

    wave, _ = jax.lax.while_loop(cond, body, (supports(wave), wave.sum() + 1))
    contradiction = (wave.sum(axis=0) == 0).any()
    return wave, contradiction


def _choose_location(wave, prefs, loc_heuristic: str):
    """One of the reference's location heuristics (solver.py:167-305); all
    are an arg-extreme over a per-cell score restricted to unresolved cells."""
    P, W, H = wave.shape
    counts = wave.sum(axis=0)
    unresolved = counts > 1
    if loc_heuristic in ("entropy", "anti-entropy"):
        base = prefs + counts
    elif loc_heuristic == "random":
        base = prefs
    elif loc_heuristic == "simple":
        base = counts.astype(jnp.float32)
    else:  # lexical / spiral / hilbert: static cell order in prefs
        base = prefs
    if loc_heuristic == "anti-entropy":
        score = jnp.where(unresolved, base, -jnp.inf)
        flat = jnp.argmax(score)
    else:
        score = jnp.where(unresolved, base, jnp.inf)
        flat = jnp.argmin(score)
    return flat // H, flat % H


def _choose_pattern(key, wave, i, j, weights, choice_heuristic: str):
    """One of the reference's pattern heuristics (solver.py:316-406)."""
    cell = wave[:, i, j]
    if choice_heuristic == "weighted":
        probs = weights * cell
        return jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-30)))
    if choice_heuristic == "random":
        probs = 1.0 * cell
        return jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-30)))
    if choice_heuristic == "lexical":
        # First possible pattern (solver.py:316-318).
        return jnp.argmax(cell).astype(jnp.int32)
    # rarest / most-common: global possibility counts, NOT masked by the
    # cell's domain (reference solver.py:384-406) — an illegal pick then
    # contradicts in propagate; mirrored.
    sums = wave.sum(axis=(1, 2))
    target = sums.max() if choice_heuristic == "rarest" else sums.min()
    mask = sums == target
    return jax.random.categorical(key, jnp.log(jnp.maximum(1.0 * mask, 1e-30)))


@partial(
    jax.jit,
    static_argnames=(
        "periodic",
        "max_attempts",
        "loc_heuristic",
        "choice_heuristic",
        "backtracking",
        "with_stats",
        "on_choice",
        "on_observe",
        "on_propagate",
        "on_backtrack",
    ),
)
def wfc_solve(
    key,
    adj,
    weights,
    prefs_scale,
    periodic: bool,
    max_attempts: int = 64,
    loc_heuristic: str = "entropy",
    choice_heuristic: str = "weighted",
    backtracking: bool = False,
    with_stats: bool = False,
    on_choice=None,
    on_observe=None,
    on_propagate=None,
    on_backtrack=None,
):
    """Solve one wave.  Returns (pattern_grid int32[W, H], success bool) or,
    with ``with_stats=True``, (grid, ok, stats) where stats is a dict of
    scalars: attempts, collapses, backtracks, contradictions.

    ``on_choice(pattern, i, j)`` / ``on_observe(wave)`` / ``on_propagate(wave)``
    / ``on_backtrack()`` mirror the reference Solver's event hooks
    (solver.py:47-51); under jit they fire as ``jax.debug.callback``s on the
    host, so attach them only for debugging/analysis runs.

    ``prefs_scale`` is a (W, H)-shaped template used only for its shape: the
    heuristics' random preferences are redrawn per attempt (reference
    control.py:175-177 draws them once per env build; redrawing on restart
    only decorrelates retries)."""
    if loc_heuristic not in LOC_HEURISTICS:
        raise NotImplementedError(f"loc_heuristic={loc_heuristic!r}")
    if choice_heuristic not in CHOICE_HEURISTICS:
        raise NotImplementedError(f"choice_heuristic={choice_heuristic!r}")
    P = adj.shape[1]
    W, H = prefs_scale.shape

    if loc_heuristic == "spiral":
        static_order = jnp.asarray(_spiral_order(W, H), jnp.float32)
    elif loc_heuristic == "hilbert":
        static_order = jnp.asarray(_hilbert_order(W, H), jnp.float32)
    elif loc_heuristic == "lexical":
        # Constant score; argmin tie-breaks to the first flat index, matching
        # the reference's unravel(argmin(ones)) (solver.py:306-311).
        static_order = jnp.ones((W, H), jnp.float32)
    else:
        static_order = None

    max_steps = 4 * W * H  # bounded-compute cap (the reference loops freely)

    def attempt(k):
        k_prefs, k_loop = jax.random.split(k)
        rand_prefs = jax.random.uniform(k_prefs, (W, H)) * 0.1
        if static_order is None:
            prefs = rand_prefs
        elif loc_heuristic in ("spiral", "hilbert"):
            # Cells beyond the curve keep their random preference values
            # (reference fill_with_curve leaves them untouched).
            prefs = jnp.where(static_order > 1.5, rand_prefs, static_order)
        else:
            prefs = static_order
        wave0 = jnp.ones((P, W, H), bool)

        def solved(wave):
            return (wave.sum() == W * H) & (wave.sum(axis=0) == 1).all()

        # carry: wave, failed, key, steps, (collapses, backtracks)
        def cond(carry):
            wave, failed, k, steps, _ = carry
            return (~solved(wave)) & (~failed) & (steps < max_steps)

        def body(carry):
            wave, _, k, steps, counters = carry
            collapses, backtracks = counters
            k, kc = jax.random.split(k)
            i, j = _choose_location(wave, prefs, loc_heuristic)
            pattern = _choose_pattern(kc, wave, i, j, weights, choice_heuristic)
            snapshot = wave  # reference solve_next entry push (solver.py:84-85)
            collapsed = wave.at[:, i, j].set(False).at[pattern, i, j].set(True)
            if on_choice is not None:
                jax.debug.callback(on_choice, pattern, i, j)
            if on_observe is not None:
                jax.debug.callback(on_observe, collapsed)
            new_wave, contradiction = _propagate(collapsed, adj, periodic)
            if on_propagate is not None:
                jax.debug.callback(on_propagate, new_wave)
            if not backtracking:
                return (
                    new_wave,
                    contradiction,
                    k,
                    steps + 1,
                    (collapses + 1, backtracks),
                )
            # Backtrack: pop the entry snapshot and ban the choice
            # (solver.py:103-112), then the next iteration's entry propagate
            # runs outside the reference's try — its contradiction fails the
            # whole attempt (solver.py:85-87).
            def backtrack(_):
                if on_backtrack is not None:
                    jax.debug.callback(on_backtrack)
                banned = snapshot.at[pattern, i, j].set(False)
                return _propagate(banned, adj, periodic)

            wave, failed = jax.lax.cond(
                contradiction, backtrack, lambda _: (new_wave, jnp.asarray(False)), None
            )
            return (
                wave,
                failed,
                k,
                steps + 1,
                (collapses + 1, backtracks + contradiction.astype(jnp.int32)),
            )

        wave, contradiction = _propagate(wave0, adj, periodic)
        wave, failed, _, steps, counters = jax.lax.while_loop(
            cond,
            body,
            (wave, contradiction, k_loop, jnp.int32(0), (jnp.int32(0), jnp.int32(0))),
        )
        ok = solved(wave) & ~failed
        return jnp.argmax(wave, axis=0).astype(jnp.int32), ok, counters

    def cond(carry):
        _, ok, k, n, _ = carry
        return (~ok) & (n < max_attempts)

    def body(carry):
        _, _, k, n, totals = carry
        collapses, backtracks, contradictions = totals
        k, ka = jax.random.split(k)
        grid, ok, (c, b) = attempt(ka)
        totals = (collapses + c, backtracks + b, contradictions + (~ok).astype(jnp.int32))
        return grid, ok, k, n + 1, totals

    k0, kl = jax.random.split(key)
    grid, ok, (c0, b0) = attempt(k0)
    zero = jnp.int32(0)
    totals = (c0, b0, (~ok).astype(jnp.int32))
    grid, ok, _, n, totals = jax.lax.while_loop(
        cond, body, (grid, ok, kl, zero, totals)
    )
    if not with_stats:
        return grid, ok
    collapses, backtracks, contradictions = totals
    stats = {
        "attempts": n + 1,
        "collapses": collapses,
        "backtracks": backtracks,
        "contradictions": contradictions,
    }
    return grid, ok, stats
