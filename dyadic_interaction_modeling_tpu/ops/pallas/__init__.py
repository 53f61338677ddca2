"""Pallas TPU kernels for the hot ops (SURVEY.md section 7.2).

* ``vq``: fused L2 nearest-codebook search - codebook pinned in VMEM, one
  MXU matmul + argmin + one-hot gather per tile, never materialising the
  (N, n_e) distance matrix in HBM.
* ``attention``: tiled flash-attention for long-sequence encoders.
"""

from .vq import pallas_nearest_code, pallas_vq_available

__all__ = ["pallas_nearest_code", "pallas_vq_available"]
