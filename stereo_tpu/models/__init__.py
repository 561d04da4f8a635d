from stereo_tpu.models.base import DispMap  # noqa: F401
from stereo_tpu.models.global_stereo import DispMapGlobalStereo  # noqa: F401
from stereo_tpu.models.ncc import DispMapNCC  # noqa: F401
