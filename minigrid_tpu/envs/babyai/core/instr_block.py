"""BabyAI verifier as a fused-kernel extension (block layout).

Block-layout twin of ``verify_step`` (instr.py:314-470, itself the device
port of the reference verifier minigrid/envs/babyai/core/verifier.py:49-566),
so ALL RoomGridLevel families run inside the whole-rollout Pallas kernel
(ops/fused_rollout.py) with the verifier's tracking planes resident in VMEM.

State packing (``FusedExt.pack_extra``): the InstrState pytree becomes
8 int32 per-env scalars + 2 int32 [W*H] planes:

* word 0 ``top``:   bits 0-1 top_kind, 2 a_is_and, 3 b_is_and, 4 strict,
  5 done_mode
* word 1 ``leaf``:  bits 3l..3l+2 = leaf_kind+1 per leaf l; bits 12+l =
  leaf_strict
* words 2-4 ``d_type/d_color/d_loc``: nibble (leaf*2+d) = value+1
* word 5 ``d_plural``: bit leaf*2+d
* word 6 ``carried``: bit leaf*2+d (pack_slots layout, instr.py:141-154)
* word 7 ``mem``:   bits 0-3 pre_none, 4-7 pre_move_tracked, 8-11
  last_match, 12-15 sub_succ, 16 a_succ, 17 b_succ
* plane 0 ``gridm``, plane 1 ``poss`` (already bit-packed per slot)

Every op below is elementwise / broadcast / masked-reduce over the leading
(untiled) axes — the kernel layout contract (ops/fused_ext.py).  Bit-exact
equivalence vs the XLA ``step_cached`` path is enforced per family by
tests/test_fused_rollout.py (final InstrState included).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import OBJ_BOX, OBJ_DOOR, STATE_OPEN
from minigrid_tpu.envs.babyai.core.instr import (
    LEAF_GOTO,
    LEAF_OPEN,
    LEAF_PICKUP,
    S_CONTINUE,
    S_FAILURE,
    S_SUCCESS,
    TOP_ACTION,
    TOP_AFTER,
    TOP_AND,
    TOP_BEFORE,
    InstrState,
)
from minigrid_tpu.ops import fused_ext as fx

_SLOT_SHIFT = jnp.arange(4, dtype=jnp.int32)[:, None] * 2 + jnp.arange(
    2, dtype=jnp.int32
)


def _pack_bits42(flags):
    """bool[..., 4, 2] -> int32[...] (bit leaf*2 + d)."""
    return jnp.sum(
        jnp.where(flags, jnp.int32(1) << _SLOT_SHIFT, 0), axis=(-2, -1)
    ).astype(jnp.int32)


def _unpack_bits42(word):
    return ((word[..., None, None] >> _SLOT_SHIFT) & 1) != 0


def _pack_nib42(vals):
    """int[..., 4, 2] in [-1, 14] -> int32[...] nibbles of value+1."""
    v = vals.astype(jnp.int32) + 1
    return jnp.sum(v << (_SLOT_SHIFT * 4), axis=(-2, -1)).astype(jnp.int32)


def _unpack_nib42(word):
    return ((word[..., None, None] >> (_SLOT_SHIFT * 4)) & 0xF) - 1


def _pack_bits4(flags, off):
    """bool[..., 4] -> int32[...] bits off..off+3."""
    sh = jnp.arange(4, dtype=jnp.int32) + off
    return jnp.sum(jnp.where(flags, jnp.int32(1) << sh, 0), axis=-1).astype(
        jnp.int32
    )


def _unpack_bits4(word, off):
    sh = jnp.arange(4, dtype=jnp.int32) + off
    return ((word[..., None] >> sh) & 1) != 0


class BabyAIFusedExt(fx.FusedExt):
    n_scalars = 8
    n_planes = 2

    def pack_extra(self, env, extra):
        ins: InstrState = extra["instr"]
        b = lambda x: x.astype(jnp.int32)
        top = (
            b(ins.top_kind)
            | (b(ins.a_is_and) << 2)
            | (b(ins.b_is_and) << 3)
            | (b(ins.strict) << 4)
            | (b(ins.done_mode) << 5)
        )
        leaf = jnp.sum(
            (b(ins.leaf_kind) + 1) << (jnp.arange(4, dtype=jnp.int32) * 3),
            axis=-1,
        ).astype(jnp.int32) | _pack_bits4(ins.leaf_strict, 12)
        mem = (
            _pack_bits4(ins.pre_none, 0)
            | _pack_bits4(ins.pre_move_tracked, 4)
            | _pack_bits4(ins.last_match, 8)
            | _pack_bits4(ins.sub_succ, 12)
            | (b(ins.a_succ) << 16)
            | (b(ins.b_succ) << 17)
        )
        scal = jnp.stack(
            [
                top,
                leaf,
                _pack_nib42(ins.d_type),
                _pack_nib42(ins.d_color),
                _pack_nib42(ins.d_loc),
                _pack_bits42(ins.d_plural),
                _pack_bits42(ins.carried),
                mem,
            ],
            axis=-1,
        )
        wh = ins.gridm.shape[-1] * ins.gridm.shape[-2]
        planes = jnp.stack(
            [
                ins.gridm.reshape(ins.gridm.shape[:-2] + (wh,)),
                ins.poss.reshape(ins.poss.shape[:-2] + (wh,)),
            ],
            axis=-2,
        ).astype(jnp.int32)
        return scal.astype(jnp.int32), planes

    def unpack_extra(self, env, scal, planes):
        W, H = env.width, env.height
        top, leaf, dtp, dcl, dlc, dpl, carried, mem = (
            scal[..., k] for k in range(8)
        )
        lead = top.shape
        return {
            "instr": InstrState(
                top_kind=top & 3,
                a_is_and=((top >> 2) & 1) != 0,
                b_is_and=((top >> 3) & 1) != 0,
                strict=((top >> 4) & 1) != 0,
                leaf_kind=(
                    (leaf[..., None] >> (jnp.arange(4, dtype=jnp.int32) * 3)) & 7
                )
                - 1,
                leaf_strict=_unpack_bits4(leaf, 12),
                d_type=_unpack_nib42(dtp),
                d_color=_unpack_nib42(dcl),
                d_loc=_unpack_nib42(dlc),
                d_plural=_unpack_bits42(dpl),
                poss=planes[..., 1, :].reshape(lead + (W, H)),
                gridm=planes[..., 0, :].reshape(lead + (W, H)),
                carried=_unpack_bits42(carried),
                pre_none=_unpack_bits4(mem, 0),
                pre_move_tracked=_unpack_bits4(mem, 4),
                done_mode=((top >> 5) & 1) != 0,
                last_match=_unpack_bits4(mem, 8),
                a_succ=((mem >> 16) & 1) != 0,
                b_succ=((mem >> 17) & 1) != 0,
                sub_succ=_unpack_bits4(mem, 12),
            )
        }

    def post_step(self, ctx):
        """verify_step (instr.py:314-470) on the block layout, then the
        RoomGridLevel._post_step reward/termination overlay (level.py:285-295)."""
        W, H = ctx.W, ctx.H
        a = ctx.action
        topw, leafw = ctx.scal[0], ctx.scal[1]
        carried, mem = ctx.scal[6], ctx.scal[7]
        gridm, poss = ctx.planes
        fmask_prev = ctx.fmask  # front cell at the PREV pose ([WH, *S])

        prevc = fx.carry_type(ctx.sc_prev[fx.ROW_CARRY])
        nowc = fx.carry_type(ctx.sc[fx.ROW_CARRY])
        picked = (prevc == 0) & (nowc != 0)
        dropped = (prevc != 0) & (nowc == 0)
        box_consumed = (
            (a == Actions.toggle)
            & ((ctx.fcell_prev & 0xFF) == OBJ_BOX)
            & ((ctx.fcell_post & 0xFF) != OBJ_BOX)
        )

        # -- object bookkeeping (verify_step :324-350) --
        at_fwd = jnp.sum(jnp.where(fmask_prev, gridm, 0), axis=0)
        carried_old = carried
        carried = jnp.where(picked, carried | at_fwd, carried)
        gridm = jnp.where(picked[None] & fmask_prev, 0, gridm)
        gridm = jnp.where(dropped[None] & fmask_prev, gridm | carried[None], gridm)
        carried = jnp.where(dropped, 0, carried)
        gridm = jnp.where(box_consumed[None] & fmask_prev, 0, gridm)
        poss = jnp.where((a == Actions.drop)[None], gridm, poss)

        # -- per-leaf candidate statuses (_leaf_statuses, instr.py:228-291) --
        dx, dy = fx.dir_vec(ctx.sc[fx.ROW_DIR])
        fx_now = jnp.clip(ctx.sc[fx.ROW_AX] + dx, 0, W - 1)
        fy_now = jnp.clip(ctx.sc[fx.ROW_AY] + dy, 0, H - 1)
        fidx_now = fx_now * H + fy_now
        fmask_now = ctx.mask_of(fidx_now)
        fcell_now = jnp.sum(jnp.where(fmask_now, ctx.g_post, 0), axis=0)
        fnow_type = fcell_now & 0xFF
        fnow_state = (fcell_now >> 16) & 0xFF
        carrying_now = nowc != 0

        # The updated gridm word at the prev-pose fwd cell, recovered from the
        # (mutually exclusive) update rules above instead of a second full
        # [WH, *S] masked reduce: picked/box_consumed zero it, dropped ORs in
        # the pre-drop carried word, otherwise it is the pre-update read.
        at_fwd_prev_w = jnp.where(
            picked | box_consumed,
            0,
            jnp.where(dropped, at_fwd | carried_old, at_fwd),
        )
        poss_at_now_w = jnp.sum(jnp.where(fmask_now, poss, 0), axis=0)
        # PutNext "next to a tracked fixed position": reading poss at the fwd
        # cell's 4-neighborhood == reading the 4-dilation of poss at the fwd
        # cell.  Dilating along the structural WH axis is static slicing
        # (x +-1 = shift by H rows; y +-1 = shift by 1 with row-edge masks),
        # one plane pass per direction instead of a fresh one-hot mask +
        # masked reduce per neighbor (12 plane passes -> 6).
        WH = W * H
        zrow = jnp.zeros((H,) + poss.shape[1:], poss.dtype)
        z1 = jnp.zeros((1,) + poss.shape[1:], poss.dtype)
        cell_i = jax.lax.broadcasted_iota(
            jnp.int32, (WH,) + (1,) * (poss.ndim - 1), 0
        )
        not_y0 = (cell_i % H) != 0  # cell above is same column only if y > 0
        not_ytop = (cell_i % H) != H - 1
        near_plane = (
            jnp.concatenate([poss[H:], zrow], axis=0)  # x+1 neighbor
            | jnp.concatenate([zrow, poss[:-H]], axis=0)  # x-1 neighbor
            | jnp.where(not_ytop, jnp.concatenate([poss[1:], z1], axis=0), 0)
            | jnp.where(not_y0, jnp.concatenate([z1, poss[:-1]], axis=0), 0)
        )
        near_w = jnp.sum(jnp.where(fmask_now, near_plane, 0), axis=0)

        done_mode = ((topw >> 5) & 1) != 0
        is_done_act = done_mode & (a == Actions.done)

        raw_status, leaf_status = [], []
        for l in range(4):
            kind = ((leafw >> (3 * l)) & 7) - 1
            strict = ((leafw >> (12 + l)) & 1) != 0
            bit0, bit1 = 1 << (2 * l), 2 << (2 * l)
            at_prev0 = (at_fwd_prev_w & bit0) != 0
            poss_now0 = (poss_at_now_w & bit0) != 0
            near1 = (near_w & bit1) != 0
            pre_none = ((mem >> l) & 1) != 0
            pre_move = ((mem >> (4 + l)) & 1) != 0
            carried0 = (carried & bit0) != 0

            open_succ = (
                (a == Actions.toggle)
                & at_prev0
                & (fnow_type == OBJ_DOOR)
                & (fnow_state == STATE_OPEN)
            )
            open_fail = (
                strict & (a == Actions.toggle) & (fnow_type == OBJ_DOOR) & ~open_succ
            )
            goto_succ = poss_now0
            pickup_succ = (a == Actions.pickup) & pre_none & carried0
            pickup_fail = strict & (a == Actions.pickup) & carrying_now & ~pickup_succ
            put_succ = (a == Actions.drop) & dropped & pre_move & near1
            put_fail = strict & (a == Actions.pickup) & carrying_now

            # Boolean algebra, not jnp.where over bool operands: Mosaic
            # rejects vector i1 select_n ("Unsupported target bitwidth for
            # truncation" on the i8->i1 mask trunc), and masked or-reduction
            # is the cheaper VPU form anyway.  Exactly one kind matches.
            k_open = kind == LEAF_OPEN
            k_goto = kind == LEAF_GOTO
            k_pick = kind == LEAF_PICKUP
            k_put = ~k_open & ~k_goto & ~k_pick
            succ = (
                (k_open & open_succ)
                | (k_goto & goto_succ)
                | (k_pick & pickup_succ)
                | (k_put & put_succ)
            )
            fail = (
                (k_open & open_fail) | (k_pick & pickup_fail) | (k_put & put_fail)
            ) & ~succ
            st = jnp.where(
                succ, S_SUCCESS, jnp.where(fail, S_FAILURE, S_CONTINUE)
            )
            raw = jnp.where(kind == -1, S_CONTINUE, st)
            raw_status.append(raw)
            # done-actions mode (instr.py:354-363)
            lm = ((mem >> (8 + l)) & 1) != 0
            done_leaf = jnp.where(lm, S_SUCCESS, S_FAILURE)
            leaf_status.append(
                jnp.where(
                    done_mode,
                    jnp.where(is_done_act, done_leaf, S_CONTINUE),
                    raw,
                )
            )

        # -- combinators (instr.py:294-311, :365-412) --
        top_kind = topw & 3
        a_is_and = ((topw >> 2) & 1) != 0
        b_is_and = ((topw >> 3) & 1) != 0
        strict_top = ((topw >> 4) & 1) != 0
        sub = [((mem >> (12 + l)) & 1) != 0 for l in range(4)]
        a_prior = ((mem >> 16) & 1) != 0
        b_prior = ((mem >> 17) & 1) != 0

        def side_status(is_and, i0, i1, prior):
            s0 = jnp.where(sub[i0], S_SUCCESS, leaf_status[i0])
            s1 = jnp.where(sub[i1], S_SUCCESS, leaf_status[i1])
            and_st = jnp.where(
                (s0 == S_SUCCESS) & (s1 == S_SUCCESS), S_SUCCESS, S_CONTINUE
            )
            single = jnp.where(prior, S_SUCCESS, leaf_status[i0])
            return jnp.where(is_and, and_st, single)

        false = jnp.zeros_like(a_prior)
        a_status = side_status(a_is_and, 0, 1, a_prior)
        b_status = side_status(b_is_and, 2, 3, b_prior)

        is_action = top_kind == TOP_ACTION
        is_and_top = top_kind == TOP_AND
        is_before = top_kind == TOP_BEFORE
        is_after = top_kind == TOP_AFTER

        bef_status = jnp.where(
            a_prior | (a_status == S_SUCCESS),
            jnp.where(
                b_status == S_FAILURE,
                S_FAILURE,
                jnp.where(b_status == S_SUCCESS, S_SUCCESS, S_CONTINUE),
            ),
            jnp.where(
                a_status == S_FAILURE,
                S_FAILURE,
                jnp.where(
                    strict_top & (b_status == S_SUCCESS), S_FAILURE, S_CONTINUE
                ),
            ),
        )
        aft_status = jnp.where(
            b_prior | (b_status == S_SUCCESS),
            jnp.where(
                a_status == S_FAILURE,
                S_FAILURE,
                jnp.where(a_status == S_SUCCESS, S_SUCCESS, S_CONTINUE),
            ),
            jnp.where(
                b_status == S_FAILURE,
                S_FAILURE,
                jnp.where(
                    strict_top & (a_status == S_SUCCESS), S_FAILURE, S_CONTINUE
                ),
            ),
        )
        top_and_status = side_status(jnp.ones_like(a_is_and), 0, 1, false)
        status = jnp.where(
            is_action,
            leaf_status[0],
            jnp.where(
                is_and_top,
                top_and_status,
                jnp.where(is_before, bef_status, aft_status),
            ),
        )

        # -- called-mask gating + per-leaf memory (instr.py:414-460) --
        # Disjoint top_kind cases as boolean algebra (no vector-i1 select_n,
        # which Mosaic cannot lower).
        a_called = (
            is_action
            | is_and_top
            | (is_before & ~a_prior)
            | (is_after & (b_prior | (b_status == S_SUCCESS) | strict_top))
        )
        b_called = (
            is_and_top
            | (is_before & (a_prior | (a_status == S_SUCCESS) | strict_top))
            | (is_after & ~b_prior)
        )
        called = [
            a_called & ~sub[0],
            a_called & a_is_and & ~sub[1],
            b_called & ~sub[2],
            b_called & b_is_and & ~sub[3],
        ]

        carrying_now_none = nowc == 0
        new_mem = jnp.zeros_like(mem)
        for l in range(4):
            mu = called[l] & ~is_done_act
            pre_none = (mu & carrying_now_none) | (~mu & (((mem >> l) & 1) != 0))
            pre_move = (mu & ((carried & (1 << (2 * l))) != 0)) | (
                ~mu & (((mem >> (4 + l)) & 1) != 0)
            )
            dmu = done_mode & mu
            lm = (dmu & (raw_status[l] == S_SUCCESS)) | (
                ~dmu & (((mem >> (8 + l)) & 1) != 0)
            )
            ss = sub[l] | (called[l] & (leaf_status[l] == S_SUCCESS))
            new_mem = (
                new_mem
                | (pre_none.astype(jnp.int32) << l)
                | (pre_move.astype(jnp.int32) << (4 + l))
                | (lm.astype(jnp.int32) << (8 + l))
                | (ss.astype(jnp.int32) << (12 + l))
            )
        a_live = is_before | (is_after & (b_prior | (b_status == S_SUCCESS)))
        b_live = is_after | (is_before & (a_prior | (a_status == S_SUCCESS)))
        a_succ = a_prior | (a_live & (a_status == S_SUCCESS))
        b_succ = b_prior | (b_live & (b_status == S_SUCCESS))
        new_mem = (
            new_mem
            | (a_succ.astype(jnp.int32) << 16)
            | (b_succ.astype(jnp.int32) << 17)
        )

        # -- RoomGridLevel._post_step overlay (level.py:285-295) --
        reward = jnp.where(
            status == S_SUCCESS,
            ctx.success_reward(),
            jnp.where(status == S_FAILURE, 0.0, ctx.reward),
        )
        term = status != S_CONTINUE
        scal = (
            ctx.scal[0],
            ctx.scal[1],
            ctx.scal[2],
            ctx.scal[3],
            ctx.scal[4],
            ctx.scal[5],
            carried,
            new_mem,
        )
        return term, reward, scal, (gridm, poss)
