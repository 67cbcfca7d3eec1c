from scanerf_tpu.geometry import ply as ply
from scanerf_tpu.geometry.mesh_engine import ProxyMesh as ProxyMesh
