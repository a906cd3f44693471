from trackmaker_tpu.bench.ber import ber_sweep, clock_offset_sweep
from trackmaker_tpu.bench.sweep import mac_parameter_sweep

__all__ = ["ber_sweep", "clock_offset_sweep", "mac_parameter_sweep"]
