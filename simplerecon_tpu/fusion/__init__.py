"""TSDF / point-cloud fusion and meshing.

Re-creates the reference's L7 reconstruction layer (`tools/tsdf.py`,
`tools/fusers_helper.py`, `tools/torch_point_cloud_fusion.py`) TPU-first:
depth integration is a jitted vectorized voxel update, mesh extraction is
a native C++ marching-cubes kernel (the reference used a custom-patched
scikit-image wheel), and point-cloud fusion is a jitted multi-view
consistency test.
"""

from simplerecon_tpu.fusion.tsdf import TSDF, TSDFFuser
from simplerecon_tpu.fusion.fusers import get_fuser

__all__ = ["TSDF", "TSDFFuser", "get_fuser"]
