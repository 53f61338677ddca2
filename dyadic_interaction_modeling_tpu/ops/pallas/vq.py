"""Fused vector-quantization kernel.

Replaces the XLA path of ``ops.quantizer.nearest_code`` (the reference's
``z^2 + e^2 - 2 z e^T`` + argmin, quantizer.py:38-45) with one Pallas pass:

* the codebook (n_e x e_dim, e.g. 512x128 = 256 KB fp32) lives in VMEM for
  the whole kernel,
* each grid step loads a (TILE_N, e_dim) tile of latents, runs the distance
  matmul on the MXU, fuses the ``+ |z|^2 + |e|^2`` rank-1 updates and the
  argmin on the VPU, and writes only the int32 indices - the (N, n_e)
  distance matrix never touches HBM.

Shapes are padded to MXU-friendly multiples outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_N = 512


def pallas_vq_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _vq_kernel(z_ref, e_ref, e2_ref, idx_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    z = z_ref[:]                        # (TILE_N, D)
    e = e_ref[:]                        # (n_e, D)
    dots = jax.lax.dot_general(
        z, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TILE_N, n_e) on the MXU
    # |z|^2 is constant per row - it does not change the argmin; skip it.
    d = e2_ref[:] - 2.0 * dots                       # (TILE_N, n_e)
    idx_ref[:] = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=())
def pallas_nearest_code(z_flat: jax.Array, codebook: jax.Array) -> jax.Array:
    """(N, e_dim) x (n_e, e_dim) -> (N,) int32 nearest-code indices."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = z_flat.shape
    n_e = codebook.shape[0]
    n_pad = -n % TILE_N
    z_p = jnp.pad(z_flat.astype(jnp.float32), ((0, n_pad), (0, 0)))
    e32 = codebook.astype(jnp.float32)
    e2 = jnp.sum(e32 * e32, axis=1)[None, :]  # (1, n_e)

    grid = ((n + n_pad) // TILE_N,)
    idx = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_e, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_e), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, 1), jnp.int32),
    )(z_p, e32, e2)
    return idx[:n, 0]
