"""Environment zoo: one module per family; importing this package registers
all env ids (reference registration table: minigrid/__init__.py:24-569)."""

from __future__ import annotations

from minigrid_tpu.envs.crossing import CrossingEnv
from minigrid_tpu.envs.distshift import DistShiftEnv
from minigrid_tpu.envs.doorkey import DoorKeyEnv
from minigrid_tpu.envs.empty import EmptyEnv
from minigrid_tpu.envs.fourrooms import FourRoomsEnv
from minigrid_tpu.envs.lavagap import LavaGapEnv
from minigrid_tpu.registry import register

# -- Empty (reference: minigrid/__init__.py:117-160) --
register("MiniGrid-Empty-5x5-v0", EmptyEnv, size=5)
register("MiniGrid-Empty-Random-5x5-v0", EmptyEnv, size=5, agent_start_pos=None)
register("MiniGrid-Empty-6x6-v0", EmptyEnv, size=6)
register("MiniGrid-Empty-Random-6x6-v0", EmptyEnv, size=6, agent_start_pos=None)
register("MiniGrid-Empty-8x8-v0", EmptyEnv)
register("MiniGrid-Empty-16x16-v0", EmptyEnv, size=16)

# -- DoorKey (reference: minigrid/__init__.py:95-115) --
register("MiniGrid-DoorKey-5x5-v0", DoorKeyEnv, size=5)
register("MiniGrid-DoorKey-6x6-v0", DoorKeyEnv, size=6)
register("MiniGrid-DoorKey-8x8-v0", DoorKeyEnv, size=8)
register("MiniGrid-DoorKey-16x16-v0", DoorKeyEnv, size=16)

# -- FourRooms (reference: minigrid/__init__.py:162-167) --
register("MiniGrid-FourRooms-v0", FourRoomsEnv)

# -- DistShift (reference: minigrid/__init__.py:81-93) --
register("MiniGrid-DistShift1-v0", DistShiftEnv, strip2_row=2)
register("MiniGrid-DistShift2-v0", DistShiftEnv, strip2_row=5)

# -- LavaGap (reference: minigrid/__init__.py:222-240) --
register("MiniGrid-LavaGapS5-v0", LavaGapEnv, size=5)
register("MiniGrid-LavaGapS6-v0", LavaGapEnv, size=6)
register("MiniGrid-LavaGapS7-v0", LavaGapEnv, size=7)

# -- Crossings (reference: minigrid/__init__.py:36-79) --
register("MiniGrid-LavaCrossingS9N1-v0", CrossingEnv, size=9, num_crossings=1)
register("MiniGrid-LavaCrossingS9N2-v0", CrossingEnv, size=9, num_crossings=2)
register("MiniGrid-LavaCrossingS9N3-v0", CrossingEnv, size=9, num_crossings=3)
register("MiniGrid-LavaCrossingS11N5-v0", CrossingEnv, size=11, num_crossings=5)
register(
    "MiniGrid-SimpleCrossingS9N1-v0",
    CrossingEnv, size=9, num_crossings=1, obstacle_type="wall",
)
register(
    "MiniGrid-SimpleCrossingS9N2-v0",
    CrossingEnv, size=9, num_crossings=2, obstacle_type="wall",
)
register(
    "MiniGrid-SimpleCrossingS9N3-v0",
    CrossingEnv, size=9, num_crossings=3, obstacle_type="wall",
)
register(
    "MiniGrid-SimpleCrossingS11N5-v0",
    CrossingEnv, size=11, num_crossings=5, obstacle_type="wall",
)

__all__ = [
    "CrossingEnv",
    "DistShiftEnv",
    "DoorKeyEnv",
    "EmptyEnv",
    "FourRoomsEnv",
    "LavaGapEnv",
]
