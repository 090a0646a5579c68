"""Host-side utilities: oracle bot, state inspection, checkpointing."""

from minigrid_tpu.utils.babyai_bot import BabyAIBot, DisappearedBoxError
from minigrid_tpu.utils.checkpoint import load, save
from minigrid_tpu.utils.debug import pprint_grid, state_hash

__all__ = [
    "BabyAIBot",
    "DisappearedBoxError",
    "pprint_grid",
    "state_hash",
    "save",
    "load",
]
