"""Device-side Wave Function Collapse solver.

The reference's hot loop is a numpy fixed-point of adjacency matmuls with a
Python observe/collapse driver (reference: minigrid/envs/wfc/wfclogic/
solver.py:421-529).  That shape is already MXU-native: here the whole solve —
constraint propagation, entropy location heuristic, weighted pattern choice,
collapse, contradiction restart — runs as one jitted ``while_loop`` program,
with the (P, P) @ (P, W*H) support products on the matrix unit.

Heuristics implemented: entropy location (solver.py:179-192) and weighted
pattern choice (solver.py:320-336) — the combination used by every registered
preset.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


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


@partial(jax.jit, static_argnames=("periodic", "max_attempts"))
def wfc_solve(key, adj, weights, prefs_scale, periodic: bool, max_attempts: int = 64):
    """Solve one wave.  Returns (pattern_grid int32[W, H], success bool).

    ``prefs_scale`` is a (W, H)-shaped template used only for its shape: the
    entropy heuristic's random preferences are redrawn per attempt
    (reference control.py:175-177 draws them once per env build; redrawing on
    restart only decorrelates retries)."""
    P = adj.shape[1]
    W, H = prefs_scale.shape

    def attempt(k):
        k_prefs, k_loop = jax.random.split(k)
        prefs = jax.random.uniform(k_prefs, (W, H)) * 0.1
        wave0 = jnp.ones((P, W, H), bool)

        def solved(wave):
            return (wave.sum() == W * H) & (wave.sum(axis=0) == 1).all()

        def cond(carry):
            wave, contradiction, k, steps = carry
            return (~solved(wave)) & (~contradiction) & (steps <= W * H + 1)

        def body(carry):
            wave, _, k, steps = carry
            k, kc = jax.random.split(k)
            # Entropy location heuristic (solver.py:179-192).
            counts = wave.sum(axis=0)
            unresolved = counts > 1
            cell_w = jnp.where(unresolved, prefs + counts, jnp.inf)
            flat = jnp.argmin(cell_w)
            i, j = flat // H, flat % H
            # Weighted pattern choice (solver.py:320-336).
            probs = weights * wave[:, i, j]
            pattern = jax.random.categorical(kc, jnp.log(jnp.maximum(probs, 1e-30)))
            wave = wave.at[:, i, j].set(False).at[pattern, i, j].set(True)
            wave, contradiction = _propagate(wave, adj, periodic)
            return wave, contradiction, k, steps + 1

        wave, contradiction = _propagate(wave0, adj, periodic)
        wave, contradiction, _, _ = jax.lax.while_loop(
            cond, body, (wave, contradiction, k_loop, jnp.int32(0))
        )
        ok = solved(wave) & ~contradiction
        return jnp.argmax(wave, axis=0).astype(jnp.int32), ok

    def cond(carry):
        _, ok, k, n = carry
        return (~ok) & (n < max_attempts)

    def body(carry):
        _, _, k, n = carry
        k, ka = jax.random.split(k)
        grid, ok = attempt(ka)
        return grid, ok, k, n + 1

    k0, kl = jax.random.split(key)
    grid, ok = attempt(k0)
    grid, ok, _, _ = jax.lax.while_loop(cond, body, (grid, ok, kl, jnp.int32(0)))
    return grid, ok
