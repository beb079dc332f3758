"""Cubed-sphere (6-facet) topology and halo exchange.

The TPU-native replacement for the reference's exch2 package
(pkg/exch2/W2_EXCH2_TOPOLOGY.h: per-tile neighbor lists with 2x2
index-permutation matrices encoding face-edge rotation;
w2_set_cs6_facets.F wires the 6-face cube). Here the topology is derived
directly from the `.mitgrid` corner coordinates: two face edges are
neighbors iff their corner points coincide on the sphere, which also
yields the orientation (reversed or not) — self-validating against the
grid files instead of hand-coded wiring.

Fields are stored per-face: [..., 6, n + 2*ol, n + 2*ol]. Halo exchange
is a precomputed flat gather (index + sign arrays), one `take` per field
— on TPU this compiles to vectorized dynamic-slices; under shard_map the
same maps drive ppermute sends between face-holding devices.

Vector exchange follows the C-grid ownership rule of the cube: every
cube edge pairs an E/N side with a W/S side, so each shared-edge normal
velocity is owned by exactly one face's interior (the W/S side), and all
halo face values resolve to neighbor interiors (the reference encodes the
same property through exch2_uv bounds logic, pkg/exch2/exch2_get_uv_bounds.F).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

_RECORDS = ["xC", "yC", "dxF", "dyF", "rA", "xG", "yG", "dxV", "dyU",
            "rAz", "dxC", "dyC", "rAw", "rAs", "dxG", "dyG"]

# edge codes
N, S, E, W = 0, 1, 2, 3
_EDGES = [N, S, E, W]


def read_mitgrid(path: str, n: int) -> Dict[str, np.ndarray]:
    """Read one face file: 16 consecutive big-endian f64 records of
    (n+1)x(n+1) (model/src/ini_curvilinear_grid.F:292-345, order per
    SURVEY Appendix A; optional records 17-18 AngleCS/AngleSN)."""
    raw = np.fromfile(path, dtype=">f8")
    per = (n + 1) * (n + 1)
    nrec = raw.size // per
    out = {}
    for irec in range(min(nrec, 18)):
        name = _RECORDS[irec] if irec < 16 else ("AngleCS", "AngleSN")[irec - 16]
        out[name] = raw[irec * per:(irec + 1) * per].reshape(n + 1, n + 1).astype(np.float64)
    return out


def _edge_corners(xg, yg, edge):
    """Corner coordinate sequence along an edge, as 3-D unit vectors.
    Along-direction: N/S edges follow increasing i, E/W increasing j."""
    if edge == N:
        lon, lat = xg[-1, :], yg[-1, :]
    elif edge == S:
        lon, lat = xg[0, :], yg[0, :]
    elif edge == E:
        lon, lat = xg[:, -1], yg[:, -1]
    else:
        lon, lat = xg[:, 0], yg[:, 0]
    lo = np.deg2rad(lon)
    la = np.deg2rad(lat)
    return np.stack([np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo),
                     np.sin(la)], axis=-1)


class EdgeLink(NamedTuple):
    nbr: int       # neighbor face (0-based)
    nbr_edge: int  # which edge of the neighbor
    rev: bool      # along-edge order reversed


def build_topology(faces: List[Dict[str, np.ndarray]], n: int
                   ) -> Dict[Tuple[int, int], EdgeLink]:
    """Match all face-edge pairs by corner coordinates."""
    corners = {}
    for f, g in enumerate(faces):
        # xG/yG records are (n+1)x(n+1) with the full corner set
        for e in _EDGES:
            corners[(f, e)] = _edge_corners(g["xG"], g["yG"], e)
    topo: Dict[Tuple[int, int], EdgeLink] = {}
    tol = 1.0e-6
    for f in range(6):
        for e in _EDGES:
            a = corners[(f, e)]
            for g in range(6):
                if g == f:
                    continue
                for eg in _EDGES:
                    b = corners[(g, eg)]
                    if np.max(np.linalg.norm(a - b, axis=-1)) < tol:
                        topo[(f, e)] = EdgeLink(g, eg, False)
                    elif np.max(np.linalg.norm(a - b[::-1], axis=-1)) < tol:
                        topo[(f, e)] = EdgeLink(g, eg, True)
    missing = [k for f in range(6) for k in [(f, e) for e in _EDGES]
               if k not in topo]
    if missing:
        raise ValueError(f"cube topology incomplete; unmatched edges {missing}")
    return topo


def _cell_map(edge: int, link: EdgeLink, n: int):
    """Affine map from (depth d>=1, along a) beyond `edge` of a face to the
    neighbor's 0-based interior cell (j_g, i_g); also the image of the
    local x,y unit vectors in the neighbor frame.

    Returns (T, Mx, My): T(d, a) -> (j_g, i_g);
    Mx/My in {(+1,'x'),(-1,'x'),(+1,'y'),(-1,'y')} as (sign, axis)."""
    g, eg, rev = link

    def along(a):
        return (n - 1 - a) if rev else a

    if eg == N:
        def T(d, a):
            return (n - d, along(a))
        IN = (-1, "y")
        AL = (1, "x")
    elif eg == S:
        def T(d, a):
            return (d - 1, along(a))
        IN = (1, "y")
        AL = (1, "x")
    elif eg == E:
        def T(d, a):
            return (along(a), n - d)
        IN = (-1, "x")
        AL = (1, "y")
    else:
        def T(d, a):
            return (along(a), d - 1)
        IN = (1, "x")
        AL = (1, "y")
    sgn_al = -1 if rev else 1
    AL = (AL[0] * sgn_al, AL[1])

    # local OUT/ALONG for my edge
    if edge == N:
        OUT_is, AL_is = "y", "x"
        out_sign = 1
    elif edge == S:
        OUT_is, AL_is = "y", "x"
        out_sign = -1
    elif edge == E:
        OUT_is, AL_is = "x", "y"
        out_sign = 1
    else:
        OUT_is, AL_is = "x", "y"
        out_sign = -1
    # my OUT maps to neighbor IN; my ALONG maps to neighbor AL
    maps = {}
    maps[OUT_is] = (IN[0] * out_sign, IN[1])
    maps[AL_is] = AL
    Mx = maps["x"]
    My = maps["y"]
    return T, Mx, My


class CSExchange:
    """Precomputed gather maps for C/U/V/Z-point halo fills."""

    def __init__(self, faces: List[Dict[str, np.ndarray]], n: int, ol: int):
        self.n, self.ol = n, ol
        self.topo = build_topology(faces, n)
        self._build_scalar_map()
        self._build_vector_map()

    # ---------------- scalar (cell-center) ----------------
    def _halo_cells(self):
        """Yield (face, edge, depth d>=1, along a, padded (jp, ip))."""
        n, ol = self.n, self.ol
        for f in range(6):
            for e in _EDGES:
                for d in range(1, ol + 1):
                    for a in range(n):
                        if e == N:
                            jp, ip = ol + n - 1 + d, ol + a
                        elif e == S:
                            jp, ip = ol - d, ol + a
                        elif e == E:
                            jp, ip = ol + a, ol + n - 1 + d
                        else:
                            jp, ip = ol + a, ol - d
                        yield f, e, d, a, jp, ip

    def _build_scalar_map(self):
        n, ol = self.n, self.ol
        nyp = nxp = n + 2 * ol
        size = 6 * nyp * nxp
        idx = np.arange(size).reshape(6, nyp, nxp).copy()
        valid = np.zeros((6, nyp, nxp), bool)
        valid[:, ol:ol + n, ol:ol + n] = True
        for f, e, d, a, jp, ip in self._halo_cells():
            link = self.topo[(f, e)]
            T, _, _ = _cell_map(e, link, n)
            jg, ig = T(d, a)
            idx[f, jp, ip] = (link.nbr * nyp + (jg + ol)) * nxp + (ig + ol)
            valid[f, jp, ip] = True
        self.sc_idx = jnp.asarray(idx.reshape(-1))
        self.sc_valid = jnp.asarray(valid.astype(np.float64))

    def fill_C(self, arr):
        """Fill halos of a cell-centered field [..., 6, nyp, nxp]."""
        flat = arr.reshape(arr.shape[:-3] + (-1,))
        out = jnp.take(flat, self.sc_idx, axis=-1)
        out = out.reshape(arr.shape)
        return out * self.sc_valid

    # ---------------- C-grid vector (u at W faces, v at S faces) -------
    def _build_vector_map(self):
        """u_halo/v_halo gathers from the stacked source [2, 6, nyp, nxp]
        (0=u, 1=v), with sign flips for rotated edges."""
        n, ol = self.n, self.ol
        nyp = nxp = n + 2 * ol
        fsz = nyp * nxp
        size = 2 * 6 * fsz

        def flat(comp, face, jg, ig):
            return ((comp * 6 + face) * nyp + jg) * nxp + ig

        u_idx = np.empty((6, nyp, nxp), np.int64)
        v_idx = np.empty((6, nyp, nxp), np.int64)
        u_sgn = np.zeros((6, nyp, nxp))
        v_sgn = np.zeros((6, nyp, nxp))
        # interior (and owned W/S edge columns) map to themselves
        for f in range(6):
            for jp in range(nyp):
                for ip in range(nxp):
                    u_idx[f, jp, ip] = flat(0, f, jp, ip)
                    v_idx[f, jp, ip] = flat(1, f, jp, ip)
        u_sgn[:, ol:ol + n, ol:ol + n] = 1.0
        v_sgn[:, ol:ol + n, ol:ol + n] = 1.0

        def face_value(f, cellA, cellB, axis):
            """Index+sign of the stored normal velocity for the face
            between adjacent cells A,B (0-based face-local cell indices,
            possibly outside [0,n)), separated along `axis` of face f.
            Chooses u (axis=x) or v (axis=y) at the higher-index cell."""
            (ja, ia), (jb, ib) = cellA, cellB
            if axis == "x":
                i_hi = max(ia, ib)
                j_hi = ja
                return flat(0, f, j_hi + self.ol, i_hi + self.ol)
            i_hi = ia
            j_hi = max(ja, jb)
            return flat(1, f, j_hi + self.ol, i_hi + self.ol)

        for f, e, d, a, jp, ip in self._halo_cells():
            link = self.topo[(f, e)]
            T, Mx, My = _cell_map(e, link, n)

            def map_cell(dd, aa):
                # extend T to depth 0 (our own edge row) via affinity
                if dd >= 1:
                    return T(dd, aa)
                j1, i1 = T(1, aa)
                j2, i2 = T(2, aa)
                return (2 * j1 - j2, 2 * i1 - i2)

            # --- u at this halo cell: face between (d,a) and its -x nbr
            if e in (E, W):
                # -x in face-local = depth direction +/-1
                dd0 = d - 1 if e == E else d + 1
                cA = map_cell(d, a)
                cB = map_cell(dd0, a)
            else:
                cA = map_cell(d, a)
                cB = map_cell(d, a - 1) if a - 1 >= 0 else None
                if cB is None:
                    # along-edge neighbor outside strip: extrapolate
                    j1, i1 = map_cell(d, 0)
                    j2, i2 = map_cell(d, 1)
                    cB = (2 * j1 - j2, 2 * i1 - i2)
            sgn, axis = Mx
            src = face_value(link.nbr, cA, cB, axis)
            u_idx[f, jp, ip] = src
            u_sgn[f, jp, ip] = sgn
            # for -x/-y mapped axes the "higher-index cell" convention
            # already picks the right stored face; the sign handles
            # direction reversal
            # --- v at this halo cell: face between (d,a) and its -y nbr
            if e in (N, S):
                dd0 = d - 1 if e == N else d + 1
                cA = map_cell(d, a)
                cB = map_cell(dd0, a)
            else:
                cA = map_cell(d, a)
                if a - 1 >= 0:
                    cB = map_cell(d, a - 1)
                else:
                    j1, i1 = map_cell(d, 0)
                    j2, i2 = map_cell(d, 1)
                    cB = (2 * j1 - j2, 2 * i1 - i2)
            sgn, axis = My
            src = face_value(link.nbr, cA, cB, axis)
            v_idx[f, jp, ip] = src
            v_sgn[f, jp, ip] = sgn

        self.u_idx = jnp.asarray(u_idx.reshape(-1))
        self.v_idx = jnp.asarray(v_idx.reshape(-1))
        self.u_sgn = jnp.asarray(u_sgn)
        self.v_sgn = jnp.asarray(v_sgn)

    def fill_UV(self, u, v, with_sign: bool = True):
        """Fill halos of a C-grid vector pair [..., 6, nyp, nxp]."""
        stacked = jnp.stack([u, v], axis=-4)
        flat = stacked.reshape(stacked.shape[:-4] + (-1,))
        un = jnp.take(flat, self.u_idx, axis=-1).reshape(u.shape)
        vn = jnp.take(flat, self.v_idx, axis=-1).reshape(v.shape)
        if with_sign:
            un = un * self.u_sgn
            vn = vn * self.v_sgn
        else:
            un = un * jnp.abs(self.u_sgn)
            vn = vn * jnp.abs(self.v_sgn)
        return un, vn

    # ---------------- corner (Z) points ----------------
    def build_z_map(self):
        """Gather map for corner-point fields (vorticity points, xG/yG,
        dxV/dyU/rAz, fCoriG): padded index (jp, ip) holds the corner at the
        cell's SW position; shared-edge corners are stored consistently on
        both faces, so halo corners map directly."""
        if hasattr(self, "z_idx"):
            return
        n, ol = self.n, self.ol
        nyp = nxp = n + 2 * ol
        idx = np.arange(6 * nyp * nxp).reshape(6, nyp, nxp).copy()
        valid = np.zeros((6, nyp, nxp))
        valid[:, ol:ol + n + 1, ol:ol + n + 1] = 1.0  # interior + NE edge row

        def corner_map(edge, link):
            g, eg, rev = link

            def along(a):       # corner index along edge, 0..n
                return (n - a) if rev else a

            if eg == N:
                def Tz(d, a):
                    return (n - d, along(a))
            elif eg == S:
                def Tz(d, a):
                    return (d, along(a))
            elif eg == E:
                def Tz(d, a):
                    return (along(a), n - d)
            else:
                def Tz(d, a):
                    return (along(a), d)
            return Tz

        for f in range(6):
            for e in _EDGES:
                link = self.topo[(f, e)]
                Tz = corner_map(e, link)
                for d in range(1, ol + 1):
                    for a in range(n + 1):
                        if e == N:
                            jp, ip = ol + n + d, ol + a
                        elif e == S:
                            jp, ip = ol - d, ol + a
                        elif e == E:
                            jp, ip = ol + a, ol + n + d
                        else:
                            jp, ip = ol + a, ol - d
                        jg, ig = Tz(d, a)
                        if 0 <= jg <= n and 0 <= ig <= n:
                            idx[f, jp, ip] = (link.nbr * nyp + (jg + ol)) \
                                * nxp + (ig + ol)
                            valid[f, jp, ip] = 1.0
        self.z_idx = jnp.asarray(idx.reshape(-1))
        self.z_valid = jnp.asarray(valid)

    def fill_Z(self, arr):
        self.build_z_map()
        flat = arr.reshape(arr.shape[:-3] + (-1,))
        out = jnp.take(flat, self.z_idx, axis=-1).reshape(arr.shape)
        return out * self.z_valid


# ----------------------------------------------------------------------
# stacked-face layout helpers: model fields are [..., 6*nyp, nxp] so the
# generic stencil kernels run unchanged (face = j-blocks, each with its
# own halo ring); the exchange reshapes to [..., 6, nyp, nxp]
# ----------------------------------------------------------------------

def _to_faces(a, nyp):
    return a.reshape(a.shape[:-2] + (6, nyp, a.shape[-1]))


def _from_faces(a):
    return a.reshape(a.shape[:-3] + (a.shape[-3] * a.shape[-2], a.shape[-1]))


class CSFill:
    """fill/fill_uv hooks for the stacked-face layout."""

    def __init__(self, ex: CSExchange):
        self.ex = ex
        self.nyp = ex.n + 2 * ex.ol

    def fill(self, a):
        return _from_faces(self.ex.fill_C(_to_faces(a, self.nyp)))

    def fill_uv(self, u, v, with_sign=True):
        uf, vf = self.ex.fill_UV(_to_faces(u, self.nyp),
                                 _to_faces(v, self.nyp), with_sign)
        return _from_faces(uf), _from_faces(vf)

    def fill_z(self, a):
        return _from_faces(self.ex.fill_Z(_to_faces(a, self.nyp)))
