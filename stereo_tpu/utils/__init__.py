from stereo_tpu.utils import io, metrics  # noqa: F401
