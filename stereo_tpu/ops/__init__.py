from stereo_tpu.ops import filters, interp, ncc, photo  # noqa: F401
