from trackmaker_tpu.dsp import osc, filters, channel  # noqa: F401
