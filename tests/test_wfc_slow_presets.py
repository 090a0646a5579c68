"""The 11 SLOW WFC presets (reference config.py:142-221, "2-20 min per
level"), exercised end to end at least once.

Round-2 coverage stopped at the 6 fast + 5 inconsistent presets; a
preprocessing bug in the slow ones (bigger pattern catalogs, all
pattern_width=3, mostly periodic) would have been invisible.  Gated into
the scheduled full-sweep lane (MINIGRID_TPU_FULL=1): catalog parity against
the reference's live extraction pipeline per preset, plus one actual level
generation through the jitted solver (the reference's 2-20 min becomes
seconds under the matmul-propagate solver, so generating is affordable
even on CPU).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = [
    pytest.mark.skipif(
        not os.environ.get("MINIGRID_TPU_FULL"),
        reason="slow-preset sweep: set MINIGRID_TPU_FULL=1 (scheduled lane)",
    ),
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "minigrid")),
        reason="reference checkout not available",
    ),
]

if os.path.isdir(os.path.join(REFERENCE, "minigrid")):
    sys.path.insert(0, REFERENCE)
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

from minigrid_tpu.envs.wfc.preprocess import (  # noqa: E402
    DIRECTIONS,
    WFC_PRESETS_SLOW,
    build_tables,
)

SLOW = list(WFC_PRESETS_SLOW)


@pytest.mark.parametrize("preset", SLOW)
def test_slow_catalog_parity(preset):
    """Pattern catalog, weights and adjacency vs the reference's own
    extraction (tiles.py/patterns.py/adjacency.py run live) — the same check
    tests/test_seed_parity_wfc.py applies to the fast presets."""
    from minigrid.envs.wfc.config import WFC_PRESETS_SLOW as REF_SLOW
    from minigrid.envs.wfc.wfclogic.adjacency import adjacency_extraction
    from minigrid.envs.wfc.wfclogic.patterns import (
        make_pattern_catalog_with_rotations,
    )
    from minigrid.envs.wfc.wfclogic.tiles import make_tile_catalog

    kw = REF_SLOW[preset].wfc_kwargs
    _cat, tile_grid, _cl, _ut = make_tile_catalog(kw["image"], kw["tile_size"])
    pat_catalog, pat_weights, pat_list, pat_grid = make_pattern_catalog_with_rotations(
        tile_grid,
        kw["pattern_width"],
        input_is_periodic=kw["input_periodic"],
        rotations=kw["rotations"] - 1,
    )
    relations = adjacency_extraction(
        pat_grid, pat_catalog, list(enumerate(DIRECTIONS)), (kw["pattern_width"],) * 2
    )
    enc = {h: i for i, h in enumerate(pat_list)}
    P = len(pat_list)
    ref_adj = np.zeros((4, P, P), bool)
    dmap = {d: i for i, d in enumerate(DIRECTIONS)}
    for d, p1, p2 in relations:
        ref_adj[dmap[d], enc[p1], enc[p2]] = True
    ref_w = np.zeros(P)
    for h, w in pat_weights.items():
        ref_w[enc[h]] = w

    # _parity_tables produces the catalog in the reference's exact hash
    # order (build_tables uses np.unique order — same multiset, so the
    # index-aligned comparison needs the parity form).
    from minigrid_tpu.compat.parity_wfc import _parity_tables

    _pats, weights, adj, _wall = _parity_tables(WFC_PRESETS_SLOW[preset])
    assert len(weights) == P, f"{preset}: pattern count"
    np.testing.assert_array_equal(ref_w, weights, err_msg=f"{preset}: weights")
    np.testing.assert_array_equal(ref_adj, adj, err_msg=f"{preset}: adjacency")


@pytest.mark.parametrize("preset", SLOW)
def test_slow_preset_generates_one_level(preset):
    """One successful solve per slow preset: every output cell collapses to
    a legal pattern index and all horizontal/vertical neighbor pairs satisfy
    the preset's adjacency relation."""
    import jax
    import jax.numpy as jnp

    from minigrid_tpu.envs.wfc.solver import wfc_solve

    cfg = WFC_PRESETS_SLOW[preset]
    t = build_tables(cfg)
    adj = jnp.asarray(t["adj"])
    w = jnp.asarray(t["weights"])
    grid, ok = jax.jit(
        lambda k: wfc_solve(
            k, adj, w, jnp.zeros((23, 23)),
            periodic=bool(cfg.output_periodic), max_attempts=64,
        )
    )(jax.random.PRNGKey(0))
    grid, ok = np.asarray(grid), bool(ok)
    assert ok, f"{preset}: no consistent level within 64 attempts"
    P = len(t["weights"])
    assert ((grid >= 0) & (grid < P)).all(), f"{preset}: invalid pattern index"
    a = np.asarray(t["adj"])
    # DIRECTIONS order in preprocess: the first axis indexes (dx, dy) pairs;
    # check the two in-grid directions via the known (1,0)/(0,1) entries.
    right = dict(zip(DIRECTIONS, range(4)))[(1, 0)]
    down = dict(zip(DIRECTIONS, range(4)))[(0, 1)]
    ok_r = a[right, grid[:-1, :], grid[1:, :]]
    ok_d = a[down, grid[:, :-1], grid[:, 1:]]
    assert ok_r.all() and ok_d.all(), f"{preset}: adjacency violated in output"
