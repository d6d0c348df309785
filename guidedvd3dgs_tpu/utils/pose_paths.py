"""Compatibility shim: the spiral/ellipse path + stepfun utilities are
vendored multinerf code and live in guidedvd3dgs_tpu.vendored
.multinerf_paths (see that module's attribution docstring)."""

from guidedvd3dgs_tpu.vendored.multinerf_paths import *  # noqa: F401,F403
from guidedvd3dgs_tpu.vendored.multinerf_paths import (  # noqa: F401
    generate_ellipse_path,
    generate_spiral_path,
    integrate_weights_np,
    invert_cdf_np,
    normalize,
    sample_np,
    viewmatrix,
)
