from tpupose.gt.augment import augment_batch  # noqa: F401
from tpupose.gt.rasterize import create_labels, labels_for_config  # noqa: F401
from tpupose.gt import augment, rasterize  # noqa: F401
