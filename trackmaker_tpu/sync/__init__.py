from trackmaker_tpu.sync.correlate import (  # noqa: F401
    normalized_xcorr,
    sliding_dot,
    sliding_energy,
)
