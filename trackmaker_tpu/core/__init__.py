from trackmaker_tpu.core.config import PhyConfig, MacConfig, NetConfig
from trackmaker_tpu.core import bitops, framing

__all__ = ["PhyConfig", "MacConfig", "NetConfig", "bitops", "framing"]
