from guidedvd3dgs_tpu.ops.projection import RasterCamera, preprocess_gaussians
from guidedvd3dgs_tpu.ops.raster import rasterize
