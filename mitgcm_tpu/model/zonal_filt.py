"""pkg/zonal_filt: FFT-based high-latitude zonal filter.

Rows poleward of zonal_filt_lat are filtered along x: forward real FFT,
Fourier amplitudes scaled by
    ampFact(lat, m) = min(1, (cos|lat|/cos lat0)^cospow / sin(pi m/Nx)^sinpow)
(zonal_filt_init.F:15-45), inverse FFT.  Land holes are pre-filled by
cyclic linear interpolation of the mean-removed field
(zonal_filt_presmooth.F) and reset to zero afterwards
(zonal_filt_postsmooth.F).

The FFTPACK half-complex layout pairs (2m, 2m+1) <-> wavenumber m with
one shared factor, so the whole filter is a per-(lat, wavenumber)
multiply on jnp.fft.rfft coefficients.  Nyquist (m = Nx/2) uses the same
formula unless zonal_filt_mode2dx != 0 (then it is zeroed).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid


@dataclass
class ZonFiltParams:
    zonal_filt_lat: float = 90.0
    zonal_filt_sinpow: int = 2
    zonal_filt_cospow: int = 2
    zonal_filt_mode2dx: int = 0
    zonal_filt_uvStar: bool = False
    zonal_filt_TrStagg: bool = True


def _amp_factors(cfg: Config, p: ZonFiltParams, lat_row):
    """[ny_pad, nx//2+1] rfft amplitude factors for one grid location.

    lat_row: 1-D latitudes (yC or yG at i=1) over the padded j range."""
    nx = cfg.nx
    m = np.arange(1, nx // 2 + 1, dtype=np.float64)
    sinm = np.sin(np.pi * m / nx) ** p.zonal_filt_sinpow
    coslat = np.cos(np.abs(np.asarray(lat_row)) * np.pi / 180.0)
    cos0 = np.cos(p.zonal_filt_lat * np.pi / 180.0)
    fac = np.minimum(
        1.0, (coslat[:, None] / cos0) ** p.zonal_filt_cospow / sinm[None, :])
    if p.zonal_filt_mode2dx != 0:
        fac[:, -1] = 0.0
    amp = np.concatenate([np.ones((fac.shape[0], 1)), fac], axis=1)
    # rows equatorward of the threshold are untouched (zonal_filter.F:27)
    active = np.abs(np.asarray(lat_row)) >= p.zonal_filt_lat
    if p.zonal_filt_mode2dx == 2:
        active = np.ones_like(active, dtype=bool)
    amp = np.where(active[:, None], amp, 1.0)
    return jnp.asarray(amp), jnp.asarray(active.astype(np.float64))


def _fill_holes(f, mask):
    """Cyclic linear interpolation across masked-out points along the
    last axis (zonal_filt_presmooth.F): remove the valid-point mean,
    fill each hole from its nearest valid neighbours, return
    (filled_field, mean).  f, mask: [..., nx]."""
    nx = f.shape[-1]
    nvalid = jnp.sum(mask, axis=-1, keepdims=True)
    nsafe = jnp.maximum(nvalid, 1.0)
    mean = jnp.sum(f * mask, axis=-1, keepdims=True) / nsafe
    g = (f - mean) * mask
    idx = jnp.arange(nx)
    # last valid index at or before i (cyclic)
    vi = jnp.where(mask > 0.0, idx, -1)
    prev = jax.lax.associative_scan(jnp.maximum, vi, axis=-1)
    last = prev[..., -1:]                      # last valid in the row
    prev = jnp.where(prev < 0, last - nx, prev)
    # next valid index at or after i (cyclic)
    viR = jnp.where(mask > 0.0, idx, 2 * nx)
    nxt = jnp.flip(jax.lax.associative_scan(
        jnp.minimum, jnp.flip(viR, axis=-1), axis=-1), axis=-1)
    first = nxt[..., :1]
    nxt = jnp.where(nxt > nx, first + nx, nxt)
    dist = idx - prev
    ln = jnp.maximum(nxt - prev, 1)
    frac = dist / ln
    fLo = jnp.take_along_axis(g, jnp.mod(prev, nx), axis=-1)
    fHi = jnp.take_along_axis(g, jnp.mod(nxt, nx), axis=-1)
    filled = jnp.where(mask > 0.0, g, fLo + (fHi - fLo) * frac)
    # all-dry rows: keep zeros
    filled = jnp.where(nvalid > 0.0, filled, 0.0)
    return filled, mean


def _filter_rows(cfg: Config, amp, active, field, mask):
    """Apply the filter to [..., ny_pad, nx] interior columns; halo x
    columns are rewritten from the cyclic result like the reference."""
    oy, ox = cfg.oly, cfg.olx
    fin = field[..., ox:-ox]
    msk = mask[..., ox:-ox]
    filled, mean = _fill_holes(fin, msk)
    spec = jnp.fft.rfft(filled, axis=-1)
    spec = spec * amp
    out = jnp.fft.irfft(spec, n=cfg.nx, axis=-1)
    out = jnp.where(msk > 0.0, out + mean, 0.0)
    sel = active[:, None] > 0.0
    out = jnp.where(sel, out, fin)
    # rebuild padded array with cyclic halo (zonal_filter.F:52-60)
    out_p = jnp.concatenate([out[..., -ox:], out, out[..., :ox]], axis=-1)
    return out_p


class ZonalFilt:
    """Precomputed per-row amplitude factors for T/U rows (yC) and V
    rows (yG)."""

    def __init__(self, cfg: Config, grid: Grid, p: ZonFiltParams):
        self.p = p
        ox = cfg.olx
        latC = np.asarray(grid.yC)[:, ox]
        latG = np.asarray(grid.yG)[:, ox]
        self.ampC, self.actC = _amp_factors(cfg, p, latC)
        self.ampV, self.actV = _amp_factors(cfg, p, latG)
        self.cfg = cfg

    def filt_c(self, field, mask):
        """Filter a field at T/U rows (gridLoc=1)."""
        return _filter_rows(self.cfg, self.ampC, self.actC, field, mask)

    def filt_v(self, field, mask):
        """Filter a field at V rows (gridLoc=2)."""
        return _filter_rows(self.cfg, self.ampV, self.actV, field, mask)

    def apply_uv(self, grid: Grid, u, v):
        """zonal_filt_apply_uv.F (select_rStar=0 branch): filter u
        (gridLoc 1, mask hFacW) and v (gridLoc 2, mask hFacS)."""
        u = self.filt_c(u, grid.hFacW)
        v = self.filt_v(v, grid.hFacS)
        return u, v

    def apply_ts(self, grid: Grid, t, s):
        """zonal_filt_apply_ts.F: filter theta and salt at T rows."""
        t = self.filt_c(t, grid.hFacC)
        s = self.filt_c(s, grid.hFacC)
        return t, s
