# Sphinx configuration for the minigrid_tpu documentation site
# (counterpart of the reference's docs/conf.py; reference: docs/conf.py:1-96).
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "minigrid_tpu"
copyright = "2026, minigrid_tpu contributors"
author = "minigrid_tpu contributors"

try:
    import minigrid_tpu

    release = getattr(minigrid_tpu, "__version__", "0.0.0")
except Exception:  # docs must build even without jax installed
    release = "0.0.0"

extensions = [
    "sphinx.ext.napoleon",
    "sphinx.ext.doctest",
    "sphinx.ext.autodoc",
    "sphinx.ext.viewcode",
]

# myst_parser renders the generated markdown env pages when available.
try:
    import myst_parser  # noqa: F401

    extensions.append("myst_parser")
except ImportError:
    pass

source_suffix = {
    ".rst": "restructuredtext",
    ".md": "markdown",
}

templates_path = ["_templates"]
exclude_patterns = ["_build"]

napoleon_use_ivar = True
napoleon_custom_sections = [("Returns", "params_style")]

html_theme = "alabaster"
html_title = "minigrid_tpu Documentation"
html_static_path = ["_static"]
