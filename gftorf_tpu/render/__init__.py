from gftorf_tpu.render.settings import CameraSpec, RasterConfig, RenderOutputs
from gftorf_tpu.render.rasterize import rasterize
from gftorf_tpu.render.oracle import rasterize_oracle
