from stereo_tpu.solvers import trws  # noqa: F401
