"""Stencil shift primitives on halo-padded arrays.

All model fields live on arrays shaped [..., ny + 2*oly, nx + 2*olx]
(j, i as the two trailing axes). `shift(a, dj, di)` returns
b[..., j, i] = a[..., j+dj, i+di] with zero fill at the array edge — the
exact analog of a Fortran stencil read against halo cells that the loop
ranges never wrote (they keep their zero initialization; see e.g.
pkg/mom_fluxform/mom_fluxform.F:133-160's zeroing of work arrays).

Cells whose stencil reaches outside the padded array are garbage-by-design,
exactly like the reference's outermost overlap ring; consumers only ever
trust interior +/- (OL-1) cells between halo exchanges.

These are pure jnp ops: XLA fuses chains of shifts+arithmetic into single
fused loops, so each model kernel compiles to roughly one memory-bound pass.
"""

from __future__ import annotations

import jax.numpy as jnp


def shift(a: jnp.ndarray, dj: int = 0, di: int = 0) -> jnp.ndarray:
    """b[..., j, i] = a[..., j+dj, i+di], zero-filled outside the array."""
    if dj == 0 and di == 0:
        return a
    out = a
    if di > 0:
        pad = [(0, 0)] * (out.ndim - 1) + [(0, di)]
        out = jnp.pad(out[..., :, di:], pad)
    elif di < 0:
        pad = [(0, 0)] * (out.ndim - 1) + [(-di, 0)]
        out = jnp.pad(out[..., :, :di], pad)
    if dj > 0:
        pad = [(0, 0)] * (out.ndim - 2) + [(0, dj), (0, 0)]
        out = jnp.pad(out[..., dj:, :], pad)
    elif dj < 0:
        pad = [(0, 0)] * (out.ndim - 2) + [(-dj, 0), (0, 0)]
        out = jnp.pad(out[..., :dj, :], pad)
    return out


def shift_k(a: jnp.ndarray, dk: int) -> jnp.ndarray:
    """b[k, j, i] = a[k+dk, j, i], zero-filled (vertical shifts, axis -3)."""
    if dk == 0:
        return a
    if dk > 0:
        pad = [(0, 0)] * (a.ndim - 3) + [(0, dk), (0, 0), (0, 0)]
        return jnp.pad(a[..., dk:, :, :], pad)
    pad = [(0, 0)] * (a.ndim - 3) + [(-dk, 0), (0, 0), (0, 0)]
    return jnp.pad(a[..., :dk, :, :], pad)


def cyclic_fill_halo(a: jnp.ndarray, oly: int, olx: int) -> jnp.ndarray:
    """Halo exchange on one device: cyclic wrap of the interior into halos.

    The reference WRAPPER's tile topology is logically doubly periodic
    (eesupp/src/exch_xy_rx.template); closed boundaries are land-masked.
    For a single device the whole domain is one tile and the exchange is a
    wrap. Under shard_map the same fill is performed by ppermute pulls from
    mesh neighbors (mitgcm_tpu/parallel/halo.py).
    """
    ny = a.shape[-2] - 2 * oly
    nx = a.shape[-1] - 2 * olx
    interior = a[..., oly:oly + ny, olx:olx + nx]
    # modular gather: exact also when the halo is wider than the interior
    jj = jnp.arange(-oly, ny + oly) % ny
    ii = jnp.arange(-olx, nx + olx) % nx
    return interior[..., jj, :][..., :, ii]


def interior(a: jnp.ndarray, oly: int, olx: int) -> jnp.ndarray:
    return a[..., oly:a.shape[-2] - oly, olx:a.shape[-1] - olx]


def pad_interior(a: jnp.ndarray, oly: int, olx: int) -> jnp.ndarray:
    """Zero-pad an interior-sized array out to the halo-padded shape."""
    pad = [(0, 0)] * (a.ndim - 2) + [(oly, oly), (olx, olx)]
    return jnp.pad(a, pad)


def set_interior(a: jnp.ndarray, values: jnp.ndarray, oly: int, olx: int) -> jnp.ndarray:
    """Return a copy of `a` with the interior replaced by `values`."""
    return a.at[..., oly:a.shape[-2] - oly, olx:a.shape[-1] - olx].set(values)


def interior_mask(shape_jihalo, oly: int, olx: int, dtype,
                  n_faces: int = 1) -> jnp.ndarray:
    """1.0 on interior cells, 0.0 on halo cells, for a padded 2-D shape.

    For the stacked-face cubed-sphere layout (n_faces > 1), the j axis
    holds n_faces blocks each with its own halo ring."""
    nyp_tot = shape_jihalo[-2]
    nx = shape_jihalo[-1] - 2 * olx
    m = jnp.zeros(shape_jihalo[-2:], dtype=dtype)
    nyp = nyp_tot // n_faces
    ny = nyp - 2 * oly
    for f in range(n_faces):
        m = m.at[f * nyp + oly:f * nyp + oly + ny, olx:olx + nx].set(1.0)
    return m
