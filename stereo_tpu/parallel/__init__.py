from stereo_tpu.parallel import mesh  # noqa: F401
