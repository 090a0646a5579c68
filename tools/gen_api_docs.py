"""Generate docs/api/*.md from class docstrings (counterpart of the
reference's docs/api/wrappers.md, which inlines wrapper docstrings)."""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import minigrid_tpu.wrappers as W  # noqa: E402


def main() -> None:
    out_dir = os.path.join(os.path.dirname(__file__), "..", "docs", "api")
    os.makedirs(out_dir, exist_ok=True)
    lines = [
        "# Wrappers",
        "",
        "All 16 reference wrappers as pure obs/reward/action transforms",
        "(reference: minigrid/wrappers.py).  Wrappers compose under",
        "`jit`/`vmap`; stateful bonuses thread their counts through a",
        "`CountingState` pytree.",
        "",
    ]
    for name in sorted(W.__all__):
        obj = getattr(W, name)
        if not inspect.isclass(obj):
            continue
        doc = inspect.getdoc(obj) or ""
        lines += [f"## {name}", "", doc, ""]
    path = os.path.join(out_dir, "wrappers.md")
    with open(path, "w", encoding="utf-8") as fp:
        fp.write("\n".join(lines))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
