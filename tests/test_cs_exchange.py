"""Cubed-sphere topology + halo exchange self-validation.

Uses only the reference .mitgrid files (solid-body.cs-32x32x1): checks
that the derived topology is a closed cube, that scalar halo cells map to
geometrically adjacent neighbor cells, and that the vector exchange picks
the physically coincident staggered point with the right sign under
face-edge rotation — the properties the reference encodes in exch2's
pij index-permutation machinery.
"""

import glob

import numpy as np
import pytest

from mitgcm_tpu.parallel import cs

GRID_DIR = "/root/reference/verification/solid-body.cs-32x32x1/input"
NCS = 32
OL = 2


@pytest.fixture(scope="module")
def faces():
    files = sorted(glob.glob(GRID_DIR + "/tile00*.mitgrid"))
    assert len(files) == 6
    return [cs.read_mitgrid(f, NCS) for f in files]


@pytest.fixture(scope="module")
def ex(faces):
    return cs.CSExchange(faces, NCS, OL)


def _unit(lon, lat):
    lo, la = np.deg2rad(lon), np.deg2rad(lat)
    return np.stack([np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo),
                     np.sin(la)], axis=-1)


def test_topology_closed(ex):
    # every edge linked, symmetric, and each cube edge pairs E/N with W/S
    assert len(ex.topo) == 24
    for (f, e), link in ex.topo.items():
        back = ex.topo[(link.nbr, link.nbr_edge)]
        assert back.nbr == f and back.nbr_edge == e
        assert back.rev == link.rev
        if e in (cs.E, cs.N):
            assert link.nbr_edge in (cs.W, cs.S), (f, e, link)


def test_scalar_halo_geometry(faces, ex):
    """Depth-1 halo cell centers must be ~one cell from the edge cells."""
    import jax.numpy as jnp
    nyp = NCS + 2 * OL
    xc = np.zeros((6, nyp, nyp))
    yc = np.zeros((6, nyp, nyp))
    for f, g in enumerate(faces):
        xc[f, OL:OL + NCS, OL:OL + NCS] = g["xC"][:NCS, :NCS]
        yc[f, OL:OL + NCS, OL:OL + NCS] = g["yC"][:NCS, :NCS]
    # exchange both (cannot wrap lon linearly -> use 3D)
    p = _unit(xc, yc)
    filled = np.stack(
        [np.asarray(ex.fill_C(jnp.asarray(p[..., c]))) for c in range(3)],
        axis=-1)
    # typical cell size (radians on unit sphere)
    d0 = np.linalg.norm(p[0, OL + 16, OL + 16] - p[0, OL + 16, OL + 17])
    for f in range(6):
        # east halo depth 1 vs last interior column
        a = filled[f, OL:OL + NCS, OL + NCS]
        b = filled[f, OL:OL + NCS, OL + NCS - 1]
        d = np.linalg.norm(a - b, axis=-1)
        assert np.all(d < 2.5 * d0), (f, d.max(), d0)
        assert np.all(d > 0.2 * d0), (f, d.min(), d0)
        # north halo
        a = filled[f, OL + NCS, OL:OL + NCS]
        b = filled[f, OL + NCS - 1, OL:OL + NCS]
        d = np.linalg.norm(a - b, axis=-1)
        assert np.all(d < 2.5 * d0) and np.all(d > 0.2 * d0), f


def _upoint_pos_dir(g):
    """u-point positions (W-face midpoints) and +x direction unit vectors
    for one face, from corners; shape [n, n+1, 3] (j, I)."""
    P = _unit(g["xG"], g["yG"])                    # [n+1, n+1, 3]
    mid = P[:-1, :, :] + P[1:, :, :]
    mid /= np.linalg.norm(mid, axis=-1, keepdims=True)
    # +x tangent at u-points ~ difference of neighboring midpoints
    dx = np.zeros_like(mid)
    dx[:, 1:-1] = mid[:, 2:] - mid[:, :-2]
    dx[:, 0] = mid[:, 1] - mid[:, 0]
    dx[:, -1] = mid[:, -1] - mid[:, -2]
    dx /= np.linalg.norm(dx, axis=-1, keepdims=True)
    return mid, dx


def _vpoint_pos_dir(g):
    P = _unit(g["xG"], g["yG"])
    mid = P[:, :-1, :] + P[:, 1:, :]
    mid /= np.linalg.norm(mid, axis=-1, keepdims=True)
    dy = np.zeros_like(mid)
    dy[1:-1, :] = mid[2:, :] - mid[:-2, :]
    dy[0, :] = mid[1, :] - mid[0, :]
    dy[-1, :] = mid[-1, :] - mid[-2, :]
    dy /= np.linalg.norm(dy, axis=-1, keepdims=True)
    return mid, dy


def test_vector_halo_position_and_sign(faces, ex):
    nyp = NCS + 2 * OL
    upos = np.zeros((6, nyp, nyp, 3))
    udir = np.zeros((6, nyp, nyp, 3))
    vpos = np.zeros((6, nyp, nyp, 3))
    vdir = np.zeros((6, nyp, nyp, 3))
    for f, g in enumerate(faces):
        up, ud = _upoint_pos_dir(g)
        vp, vd = _vpoint_pos_dir(g)
        upos[f, OL:OL + NCS, OL:OL + NCS + 1] = up
        udir[f, OL:OL + NCS, OL:OL + NCS + 1] = ud
        vpos[f, OL:OL + NCS + 1, OL:OL + NCS] = vp
        vdir[f, OL:OL + NCS + 1, OL:OL + NCS] = vd

    u_idx = np.asarray(ex.u_idx).reshape(6, nyp, nyp)
    u_sgn = np.asarray(ex.u_sgn)
    stacked_pos = np.stack([upos, vpos]).reshape(-1, 3)
    stacked_dir = np.stack([udir, vdir]).reshape(-1, 3)

    n_checked = 0
    d0 = np.linalg.norm(
        _unit(faces[0]["xC"][16, 16], faces[0]["yC"][16, 16])
        - _unit(faces[0]["xC"][16, 17], faces[0]["yC"][16, 17]))
    for f in range(6):
        for (jp, ip) in [(OL + 5, OL + NCS), (OL + NCS, OL + 7),
                         (OL + 12, OL - 1), (OL - 1, OL + 20)]:
            # these halo u-points have well-defined positions only where
            # the target position itself is computable: use depth-1 strip
            src = u_idx[f, jp, ip]
            sgn = u_sgn[f, jp, ip]
            if sgn == 0.0:
                continue
            # target u-point physical position: for E halo (ip=OL+NCS) it
            # is the shared edge = own file's I=n u-point
            tgt_pos = upos[f, jp, ip]
            tgt_dir = udir[f, jp, ip]
            if not np.any(tgt_pos):
                continue
            sp = stacked_pos[src]
            sd = stacked_dir[src]
            assert np.linalg.norm(tgt_pos - sp) < 0.3 * d0, (
                f, jp, ip, np.linalg.norm(tgt_pos - sp) / d0)
            dot = float(np.dot(tgt_dir, sd))
            assert abs(dot) > 0.85, (f, jp, ip, dot)
            assert np.sign(dot) == np.sign(sgn), (f, jp, ip, dot, sgn)
            n_checked += 1
    assert n_checked >= 6


def test_streamfunction_velocity_exchange_exact(faces, ex):
    """Definitive exchange test, free of direction-estimate artifacts:
    build C-grid velocities from a global streamfunction exactly as the
    solid-body experiment does (code/ini_vel.F: u=(psi_j - psi_j+1)/dyG,
    v=(psi_i+1 - psi_i)/dxG with psi ~ fCoriG). The flux across any face
    equals the psi difference of its endpoint corners, identical on both
    sides of a cube edge — so every exchanged halo value must equal the
    direct neighbor computation to machine precision."""
    import jax.numpy as jnp
    nyp = NCS + 2 * OL
    omega = 1.0e-5

    def psi_of(g):
        lat = np.deg2rad(g["yG"])
        return -omega * np.sin(lat)   # arbitrary smooth psi on corners

    u = np.zeros((6, nyp, nyp))
    v = np.zeros((6, nyp, nyp))
    for f, g in enumerate(faces):
        psi = psi_of(g)
        dyG = g["dyG"]
        dxG = g["dxG"]
        uu = (psi[:-1, :] - psi[1:, :]) / np.where(dyG[:NCS + 1, :] == 0, 1,
                                                   dyG[:NCS + 1, :])[:NCS, :]
        vv = (psi[:, 1:] - psi[:, :-1]) / np.where(dxG[:, :NCS + 1] == 0, 1,
                                                   dxG[:, :NCS + 1])[:, :NCS]
        u[f, OL:OL + NCS, OL:OL + NCS] = uu[:NCS, :NCS]
        v[f, OL:OL + NCS, OL:OL + NCS] = vv[:NCS, :NCS]

    uf, vf = ex.fill_UV(jnp.asarray(u), jnp.asarray(v))
    uf, vf = np.asarray(uf), np.asarray(vf)

    # direct values on the extended index range from each face's own file
    # (valid one ring beyond interior: I=n for u, J=n for v)
    for f, g in enumerate(faces):
        psi = psi_of(g)
        dyG = g["dyG"]
        dxG = g["dxG"]
        u_ext = (psi[:-1, :] - psi[1:, :]) / dyG[:NCS, :]
        v_ext = (psi[:, 1:] - psi[:, :-1]) / dxG[:, :NCS]
        # u at the E shared edge (I = n): exchange must reproduce exactly
        got = uf[f, OL:OL + NCS, OL + NCS]
        want = u_ext[:, NCS]
        assert np.allclose(got, want, rtol=1e-12, atol=1e-22), (
            f, np.abs(got - want).max(), np.abs(want).max())
        # v at the N shared edge (J = n)
        got = vf[f, OL + NCS, OL:OL + NCS]
        want = v_ext[NCS, :]
        assert np.allclose(got, want, rtol=1e-12, atol=1e-22), (
            f, np.abs(got - want).max(), np.abs(want).max())


def test_cgrid_recipe_exchange(faces, ex):
    """fill_UV_cgrid (the exact exch2_uv_cgrid_3d_rx.template sequence)
    must reproduce the owned shared-edge values exactly and agree with the
    independent geometric exchange on all depth-1 halo strips except the
    near-corner cells where the reference imposes its own convention
    (template steps 3-4)."""
    import jax.numpy as jnp
    nyp = NCS + 2 * OL
    omega = 1.0e-5

    def psi_of(g):
        return -omega * np.sin(np.deg2rad(g["yG"]))

    u = np.zeros((6, nyp, nyp))
    v = np.zeros((6, nyp, nyp))
    for f, g in enumerate(faces):
        psi = psi_of(g)
        uu = (psi[:-1, :] - psi[1:, :]) / g["dyG"][:NCS, :]
        vv = (psi[:, 1:] - psi[:, :-1]) / g["dxG"][:, :NCS]
        u[f, OL:OL + NCS, OL:OL + NCS] = uu[:NCS, :NCS]
        v[f, OL:OL + NCS, OL:OL + NCS] = vv[:NCS, :NCS]
    u1, v1 = ex.fill_UV(jnp.asarray(u), jnp.asarray(v))
    u2, v2 = ex.fill_UV_cgrid(jnp.asarray(u), jnp.asarray(v))
    u1, v1, u2, v2 = map(np.asarray, (u1, v1, u2, v2))

    for f, g in enumerate(faces):
        psi = psi_of(g)
        u_ext = (psi[:-1, :] - psi[1:, :]) / g["dyG"][:NCS, :]
        v_ext = (psi[:, 1:] - psi[:, :-1]) / g["dxG"][:, :NCS]
        assert np.allclose(u2[f, OL:OL + NCS, OL + NCS], u_ext[:, NCS],
                           rtol=1e-12, atol=0)
        assert np.allclose(v2[f, OL + NCS, OL:OL + NCS], v_ext[NCS, :],
                           rtol=1e-12, atol=0)

    m = np.zeros((6, nyp, nyp), bool)
    m[:, OL:OL + NCS, OL - 1] = True
    m[:, OL:OL + NCS, OL + NCS] = True
    m[:, OL - 1, OL:OL + NCS] = True
    m[:, OL + NCS, OL:OL + NCS] = True
    # reference-convention cells (template step 3): one per face each
    for f in range(6):
        if f % 2 == 0:
            m[f, OL + NCS, OL] = False      # u: NW corner fix
            m[f, OL, OL - 1] = False        # v: SW corner fix
        else:
            m[f, OL - 1, OL] = False        # u: SW corner fix
            m[f, OL, OL + NCS] = False      # v: SE corner fix
    scale = np.abs(u1).max()
    assert np.abs((u1 - u2)[m]).max() < 1e-12 * scale
    assert np.abs((v1 - v2)[m]).max() < 1e-12 * scale
