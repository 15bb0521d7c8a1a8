from gftorf_tpu.parallel.mesh import make_mesh
from gftorf_tpu.parallel.sharded import rasterize_sharded
