from trackmaker_tpu.phy import line_coding, encoder, decoder  # noqa: F401
