"""Family extensions for the fused whole-rollout kernel (block layout).

The fused kernel (ops/fused_rollout.py) natively implements only the
default-hook transition ``core_step -> autoreset -> obs``.  Families that
override ``_map_action``/``_post_step`` (success detection, reward shaping —
the analogue of subclass ``step`` overrides in the reference, e.g.
minigrid/envs/fetch.py:130-160) opt back into the kernel by publishing a
``fused_ext``: a block-layout twin of their hooks plus a bijective packing of
their ``EnvState.extra`` pytree into int32 per-env scalars and int32 [W*H]
planes the kernel can carry through VMEM (and blend on auto-reset, mirroring
``step_cached``'s whole-pytree blend, core/env.py:167-173).

Layout contract (see fused_rollout.py): the env batch lives in the TRAILING
dims ``*S = (E2, 8, 128)``; grids/planes are ``[W*H, *S]``; per-env scalars
are ``[*S]``.  Hooks must be expressible in elementwise ops, broadcasts and
masked reductions over the leading (untiled) axes — no gathers, no dynamic
slicing (the same rules the core kernel follows).

Equivalence with the XLA ``step_cached`` path is enforced bit-exactly per
family by tests/test_fused_rollout.py (final state INCLUDING the unpacked
``extra``, reward/done totals, obs checksum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Scalar-plane row indices shared with fused_rollout (kept here to avoid an
# import cycle; fused_rollout asserts they match).
ROW_AX, ROW_AY, ROW_DIR, ROW_CARRY, ROW_STEP, ROW_MAX, ROW_TERM, ROW_TRUNC = range(8)


class FusedCtx:
    """One transition, as seen by a family hook inside the kernel.

    ``g_prev``/``g_post``: packed grid before/after the core step
    ([WH, *S]); ``sc_prev``/``sc``: scalar rows (dict ROW_* -> [*S]) before/
    after; ``fmask``/``fcell_prev``/``fcell_post``: the step's front-cell
    write mask and the packed cell there before/after (the front cell is
    relative to the PREVIOUS pose — the only cell a core step can write);
    ``action`` is the original (un-mapped) action; ``scal``/``planes`` are
    the family's packed extra state.
    """

    def __init__(
        self,
        *,
        env,
        W,
        H,
        g_prev,
        g_post,
        c,
        sc_prev,
        sc,
        fmask,
        fcell_prev,
        fcell_post,
        action,
        reward,
        scal,
        planes,
    ):
        self.env = env
        self.W, self.H = W, H
        self.g_prev, self.g_post, self.c = g_prev, g_post, c
        self.sc_prev, self.sc = sc_prev, sc
        self.fmask = fmask
        self.fcell_prev, self.fcell_post = fcell_prev, fcell_post
        self.action = action
        self.reward = reward
        self.scal = scal
        self.planes = planes

    # -- masked-reduce helpers (TPU gathers cost ~5x a fused one-hot reduce
    #    at rollout batch sizes; see core/obs.py design notes) ---------------
    def mask_of(self, idx):
        """bool[WH, *S] one-hot of a per-env linear cell index [*S]."""
        WH = self.W * self.H
        cidx = jax.lax.broadcasted_iota(jnp.int32, (WH,) + idx.shape, 0)
        return cidx == idx[None]

    def read_at(self, plane, idx):
        """plane[idx] per env: [WH, *S] plane, [*S] linear index -> [*S]."""
        return jnp.sum(jnp.where(self.mask_of(idx), plane, 0), axis=0)

    def read_xy(self, plane, x, y):
        return self.read_at(plane, x * self.H + y)

    def success_reward(self):
        """1 - 0.9 * step/max on the post-step scalars (core/env.py:31-36)."""
        return 1.0 - 0.9 * (
            self.sc[ROW_STEP].astype(jnp.float32)
            / self.sc[ROW_MAX].astype(jnp.float32)
        )


class FusedExt:
    """Base family extension: no extra state, identity hooks.

    ``pack_extra``/``unpack_extra`` must be batch-dim agnostic (they are
    applied both to live states ``[N, ...]`` and to the reset cache
    ``[N, R, ...]``) and mutually inverse bit-exactly.
    """

    n_scalars: int = 0  # int32[*S] per-env extra scalars carried in VMEM
    n_planes: int = 0  # int32[WH, *S] per-env extra planes carried in VMEM
    # True when pre_step below is a faithful twin of the family's _pre_step
    # (pre-action dynamics, e.g. the Dynamic-Obstacles walk); families whose
    # _pre_step draws randomness must use the counter-based stream from
    # ops/prng.py (threefry2x32 over (step_count, i) with an episode-fixed
    # seed carried in the packed scalars) — the kernel does not thread the
    # jax.random split chain.
    covers_pre_step: bool = False
    # True when ``reset_block`` below generates a FRESH episode in-kernel
    # from a counter-based stream.  The fused kernels then replace the reset
    # cache entirely for this family: exact iid resets at ANY episode rate
    # (the reference's fresh-level-per-reset contract,
    # minigrid/minigrid_env.py:119-143, with no covering-R sizing), zero
    # cache VMEM, zero host-side generation per chunk.  Only feasible for
    # families whose generation is expressible under the kernel's layout
    # rules (constant scaffold + masked-uniform placements — e.g.
    # Dynamic-Obstacles, Empty-Random); rejection-resampled RoomGrid levels
    # keep the cache.
    covers_reset: bool = False

    def pack_extra(self, env, extra):
        """extra pytree (leaves [..., inner]) ->
        (int32[..., n_scalars] | None, int32[..., n_planes, W*H] | None)."""
        return None, None

    def unpack_extra(self, env, scal, planes):
        """Inverse of pack_extra on the final states ([N, ...] leaves)."""
        return None

    def map_action(self, env, a):
        """Block twin of ``_map_action`` ([*S] int32 -> [*S] int32)."""
        return a

    def pre_step(self, env, W, H, g, c, sc, scal, planes, action):
        """Block twin of ``_pre_step``: dynamics that run before the agent's
        action.  ``g``/``c``: int32[WH, *S]; ``sc``: dict ROW_* -> [*S] (the
        PRE-step scalars — step_count not yet incremented); returns the
        (possibly updated) ``(g, c, sc, scal, planes)``."""
        return g, c, sc, scal, planes

    def post_step(self, ctx: FusedCtx):
        """Block twin of ``_post_step``.

        Returns ``(term_extra, reward, scal, planes)``: extra termination
        bits (OR-ed into the post-step terminated flag), the (possibly
        reshaped) reward, and the updated extra state.
        """
        zero = jnp.zeros_like(ctx.action, bool)
        return zero, ctx.reward, ctx.scal, ctx.planes

    def reset_block(self, env, W, H, seed0, seed1, ep_idx):
        """Fresh episode per env from the counter stream (covers_reset
        families only).  ``seed0``/``seed1``: per-env int32 chunk seeds
        [*S]; ``ep_idx``: the per-env episode ordinal [*S] (the ``used``
        counter) — distinct ordinals must yield independent levels.

        Shape-polymorphic over the env axes ``*S`` exactly like the step
        hooks: with ``*S = ()`` it is the XLA single-env twin (used by the
        equivalence tests and :meth:`reset_state`); with ``*S = (E2, 8,
        128)`` / ``(B,)`` it is the kernel body — the SAME trace, so
        fused-vs-XLA bit-exactness is by construction.  Distribution parity
        with ``env._generate`` is enforced separately
        (tests/test_counter_reset.py).

        Returns ``(g, c, sc, mis, scal, planes)``: packed grid [WH, *S],
        contains plane [WH, *S], the 8 scalar rows (dict ROW_* -> [*S]),
        mission [M, *S], and the family's packed extra (tuple of [*S]
        scalars, tuple of [WH, *S] planes).  The kernels may statically
        ignore ``c``/``mis`` under the family's fused_no_objects /
        fused_static_mission capability flags.
        """
        raise NotImplementedError

    def reset_state(self, env, seed0, seed1, ep_idx):
        """XLA-side convenience: one fresh ``EnvState`` from
        :meth:`reset_block` at scalar shapes (``*S = ()``)."""
        from minigrid_tpu.core.state import EnvState

        W, H = env.width, env.height
        g, c, sc, mis, scal, planes = self.reset_block(
            env, W, H, seed0, seed1, ep_idx
        )
        extra = None
        if self.n_scalars or self.n_planes:
            scal_v = (
                jnp.stack(list(scal), axis=-1) if self.n_scalars else None
            )
            pl_v = (
                jnp.stack([p for p in planes], axis=-2)
                if self.n_planes
                else None
            )
            extra = self.unpack_extra(env, scal_v, pl_v)
        return EnvState(
            grid=g.reshape(W, H),
            contains=c.reshape(W, H),
            agent_x=sc[ROW_AX],
            agent_y=sc[ROW_AY],
            agent_dir=sc[ROW_DIR],
            carrying=sc[ROW_CARRY],
            step_count=sc[ROW_STEP],
            max_steps=sc[ROW_MAX],
            terminated=sc[ROW_TERM] != 0,
            truncated=sc[ROW_TRUNC] != 0,
            mission=mis,
            rng=jax.random.PRNGKey(0),  # never consumed (counter streams)
            extra=extra,
        )


# Domain-separation tags for the counter-reset stream (reset_block): the
# per-episode sub-seed is one threefry application of the chunk seed with
# the episode ordinal, and every placement draw within the episode uses the
# episode sub-seed with a draw counter — collision-free with the obstacle
# walk's (step_count, i) counters by the tag word.
RESET_TAG = 0x72657365  # "rese"
PLACE_TAG = 0x706C6163  # "plac"


def episode_seed(seed0, seed1, ep_idx):
    """Per-episode threefry sub-seed from the per-env chunk seed."""
    from minigrid_tpu.ops.prng import threefry2x32

    e0, e1 = threefry2x32(seed0, seed1, ep_idx, jnp.int32(RESET_TAG))
    return (
        jax.lax.bitcast_convert_type(e0, jnp.int32),
        jax.lax.bitcast_convert_type(e1, jnp.int32),
    )


def place_draw(e0, e1, j):
    """j-th placement word pair of an episode (uint32, uint32)."""
    from minigrid_tpu.ops.prng import threefry2x32

    return threefry2x32(e0, e1, jnp.int32(PLACE_TAG), jnp.asarray(j, jnp.int32))


def nth_true_index(m, target, fallback):
    """Per-env linear index of the ``target``-th True of bool[WH, *S] ``m``
    (0-based), ``fallback`` where the mask has <= target set bits.  Unrolled
    running count over the small leading cell axis — Mosaic has no cumsum
    lowering (same construction as the obstacle walk,
    envs/dynamicobstacles.py walk_obstacles)."""
    mi = m.astype(jnp.int32)
    acc = jnp.zeros_like(target)
    out = fallback
    for w in range(m.shape[0]):
        hit = m[w] & (acc == target)
        out = jnp.where(hit, jnp.int32(w), out)
        acc = acc + mi[w]
    return out


def walled_plane(W, H, S, extra_cells=()):
    """Packed base grid [WH, *S] built IN-TRACE from iota + scalar constants
    (Pallas kernels cannot capture array constants): border walls + (x, y,
    cell) extras.  ``extra_cells`` values must be concrete Python ints."""
    from minigrid_tpu.core.constants import EMPTY_CELL, WALL_CELL

    WH = W * H
    idx = jax.lax.broadcasted_iota(jnp.int32, (WH,) + tuple(S), 0)
    xs, ys = idx // H, idx % H
    border = (xs == 0) | (ys == 0) | (xs == W - 1) | (ys == H - 1)
    g = jnp.where(border, jnp.int32(int(WALL_CELL)), jnp.int32(int(EMPTY_CELL)))
    for x, y, cellv in extra_cells:
        g = jnp.where(idx == int(x) * H + int(y), jnp.int32(int(cellv)), g)
    return g


def scalar_rows(values, S):
    """Concrete int list/array [M] -> [M, *S] block, row by scalar broadcast
    (in-trace constructible; no captured array constants)."""
    import numpy as np

    vals = [int(v) for v in np.asarray(values).reshape(-1)]
    return jnp.stack([jnp.full(tuple(S), v, jnp.int32) for v in vals])


def pack_pos_pairs(*pairs):
    """Helper: int32[..., 2] position vectors -> int32[..., 2*len] scalars."""
    return jnp.concatenate([jnp.asarray(p, jnp.int32) for p in pairs], axis=-1)


def dir_vec(d):
    """DIR_TO_VEC as predicated selects (no gather): 0:+x 1:+y 2:-x 3:-y."""
    one = jnp.int32(1)
    zero = jnp.int32(0)
    dx = jnp.where(d == 0, one, jnp.where(d == 2, -one, zero))
    dy = jnp.where(d == 1, one, jnp.where(d == 3, -one, zero))
    return dx, dy


def carry_type(carry):
    return carry & 0xFF


def carry_color(carry):
    return (carry >> 8) & 0xFF


def cell_state_bits(packed):
    return (packed >> 16) & 0xFF
