"""PIRender neural renderer, rebuilt in JAX (L7).

Parity targets: the vendored PyTorch PIRender under
``/root/reference/code/Pirender/`` - FaceGenerator (mapping / warping /
editing nets), flow-based warping, multi-scale VGG19 perceptual training, the
two-stage trainer with EMA, and coefficient-dir batch inference.

All image tensors are NHWC (TPU-native layout); coefficients enter as
(B, C_coeff, T_window) like the reference.
"""

from .generator import FaceGenerator, MappingNet, WarpingNet, EditingNet
from .flow import convert_flow_to_deformation, warp_image

__all__ = [
    "FaceGenerator",
    "MappingNet",
    "WarpingNet",
    "EditingNet",
    "convert_flow_to_deformation",
    "warp_image",
]
