from tpupose.decode.api import decode_maps, to_people  # noqa: F401
from tpupose.decode import assemble, paf, peaks  # noqa: F401
