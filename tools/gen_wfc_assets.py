"""Extract WFC preset pattern images into compact .npz tile-grid assets.

The reference ships 25 small PNG pattern images
(reference: minigrid/envs/wfc/patterns/); our framework stores only their
derived tile grids (each pixel -> color id) plus the id->RGB table, which is
all the WFC pipeline needs (tile_size is 1 in every preset).

Usage: python tools/gen_wfc_assets.py
"""

from __future__ import annotations

import os

import numpy as np
from imageio.v2 import imread

SRC = "/root/reference/minigrid/envs/wfc/patterns"
DST = os.path.join(
    os.path.dirname(__file__), "..", "minigrid_tpu", "envs", "wfc", "patterns_data"
)


def main():
    os.makedirs(DST, exist_ok=True)
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".png"):
            continue
        img = imread(os.path.join(SRC, fname))[:, :, :3]
        h, w, _ = img.shape
        flat = img.reshape(-1, 3)
        colors, ids = np.unique(flat, axis=0, return_inverse=True)
        tile_grid = ids.reshape(h, w).astype(np.int32)
        out = os.path.join(DST, fname[:-4] + ".npz")
        np.savez_compressed(out, tile_grid=tile_grid, colors=colors.astype(np.uint8))
        print(f"{fname}: {h}x{w}, {len(colors)} colors -> {out}")


if __name__ == "__main__":
    main()
