from stereo_tpu.proposals import planes  # noqa: F401
