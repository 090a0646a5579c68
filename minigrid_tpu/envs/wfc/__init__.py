"""WFC subsystem (reference: minigrid/envs/wfc/)."""

from minigrid_tpu.envs.wfc.preprocess import WFC_PRESETS, WFCConfig
from minigrid_tpu.envs.wfc.wfcenv import WFCEnv

__all__ = ["WFCEnv", "WFCConfig", "WFC_PRESETS"]
