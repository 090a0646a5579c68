"""Generate the env-grid display pages (HTML cell grid per env group).

Counterpart of the reference docs pipeline's gen_envs_display.py
(reference: docs/_scripts/gen_envs_display.py): every env group gets a
``docs/environments/<group>/list.html`` with one linked GIF cell per family,
consumed by the Sphinx site.

Usage::

    python tools/gen_envs_display.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

from minigrid_tpu.registry import registered_ids, registry_entry  # noqa: E402

_CAMEL = re.compile(r"(?<!^)(?=[A-Z][a-z])")


def env_name_format(name: str) -> str:
    """CamelCase -> spaced title (reference docs/_scripts/utils.py)."""
    return _CAMEL.sub(" ", name)


def family_of(env_id: str) -> str:
    return env_id.split("-")[1]


def group_of(env_id: str) -> str:
    """Env group: babyai / wfc / minigrid (the reference groups by entry
    point module; here the id namespace carries the same split)."""
    if env_id.startswith("BabyAI-"):
        return "babyai"
    if "-WFC-" in env_id:
        return "wfc"
    return "minigrid"


def create_grid_cell(group: str, family: str) -> str:
    href = family if group != "wfc" else "WFCEnv"
    return f"""
            <a href="{href}">
                <div class="env-grid__cell">
                    <div class="cell__image-container">
                        <img src="/_static/videos/{family}.gif">
                    </div>
                    <div class="cell__title">
                        <span>{env_name_format(family).title()}</span>
                    </div>
                </div>
            </a>
    """


def generate_page(group: str, families: list[str]) -> str:
    cells = "\n".join(create_grid_cell(group, f) for f in families)
    return f"""
<div class="env-grid">
    {cells}
</div>
    """


def main() -> None:
    groups: dict[str, list[str]] = {}
    seen = set()
    for env_id in registered_ids():
        fam = family_of(env_id)
        if fam in seen:
            continue
        seen.add(fam)
        groups.setdefault(group_of(env_id), []).append(fam)

    out_root = os.path.join(os.path.dirname(__file__), "..", "docs", "environments")
    for group, families in groups.items():
        os.makedirs(os.path.join(out_root, group), exist_ok=True)
        path = os.path.join(out_root, group, "list.html")
        with open(path, "w", encoding="utf-8") as fp:
            fp.write(generate_page(group, families))
        print(f"{path}: {len(families)} families")


if __name__ == "__main__":
    main()
