from tpupose.models.openpose import (  # noqa: F401
    OpenPose,
    forward_final,
    normalize_image,
    param_group,
)
from tpupose.models import weights  # noqa: F401
