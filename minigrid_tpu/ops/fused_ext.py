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
