"""Generate per-environment markdown documentation from the registry
(the counterpart of the reference's docs pipeline,
reference: docs/_scripts/gen_env_docs.py — which renders each env class
docstring plus metadata into a markdown page per environment).

Usage::

    python tools/gen_docs.py [--out docs/environments]

Writes one ``<EnvClass>.md`` per env family plus an ``index.md`` listing
every registered id grouped by family.
"""

from __future__ import annotations

import argparse
import inspect
import os
import textwrap
from collections import defaultdict

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

ACTION_TABLE = """\
| Num | Name    | Action            |
|-----|---------|-------------------|
| 0   | left    | Turn left         |
| 1   | right   | Turn right        |
| 2   | forward | Move forward      |
| 3   | pickup  | Pick up an object |
| 4   | drop    | Drop the carried object |
| 5   | toggle  | Toggle/activate an object |
| 6   | done    | Done (used by some levels) |
"""

OBS_NOTE = """\
Observations are dicts with:

* ``image`` — ``uint8[view, view, 3]`` symbolic encoding, one
  ``(OBJECT_IDX, COLOR_IDX, STATE)`` triple per visible cell (partially
  observable, occlusion-masked); identical to the reference encoding
  (reference: minigrid/core/constants.py).
* ``direction`` — ``int32`` in ``[0, 4)``.
* ``mission`` — structured ``int32[8]`` mission vector;
  ``env.mission_text(mission)`` renders the reference's mission string.
"""


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="docs/environments")
    args = p.parse_args(argv)

    import minigrid_tpu as mg
    from minigrid_tpu.registry import registry_entry

    os.makedirs(args.out, exist_ok=True)

    by_class = defaultdict(list)
    for env_id in mg.registered_ids():
        cls, kwargs = registry_entry(env_id)
        by_class[cls].append((env_id, kwargs))

    index_rows = []
    for cls, ids in sorted(by_class.items(), key=lambda kv: kv[0].__name__):
        name = cls.__name__
        doc = inspect.getdoc(cls) or "(no description)"
        lines = [f"# {name}", ""]
        lines.append(doc)
        lines.append("")
        lines.append("## Action space")
        lines.append("")
        lines.append(ACTION_TABLE)
        lines.append("## Observations")
        lines.append("")
        lines.append(OBS_NOTE)
        lines.append("## Registered configurations")
        lines.append("")
        for env_id, kwargs in ids:
            kw = ", ".join(f"{k}={v!r}" for k, v in kwargs.items()) or "defaults"
            lines.append(f"* ``{env_id}`` — {kw}")
            index_rows.append((name, env_id))
        lines.append("")
        lines.append("## Usage")
        lines.append("")
        lines.append(
            textwrap.dedent(
                f"""\
                ```python
                import jax
                import minigrid_tpu as mg

                env = mg.make("{ids[0][0]}")
                obs, state = jax.jit(env.reset)(jax.random.PRNGKey(0))
                obs, state, reward, terminated, truncated = jax.jit(env.step)(state, 2)
                ```
                """
            )
        )
        with open(os.path.join(args.out, f"{name}.md"), "w") as f:
            f.write("\n".join(lines))

    with open(os.path.join(args.out, "index.md"), "w") as f:
        f.write("# Registered environments\n\n")
        f.write(f"{len(index_rows)} registered ids across {len(by_class)} families.\n\n")
        f.write("| Env id | Family |\n|---|---|\n")
        for name, env_id in sorted(index_rows, key=lambda r: r[1]):
            f.write(f"| ``{env_id}`` | [{name}]({name}.md) |\n")
    print(f"wrote {len(by_class)} family pages + index to {args.out}")


if __name__ == "__main__":
    main()
