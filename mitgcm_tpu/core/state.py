"""Model prognostic state and surface forcing pytrees.

State mirrors the reference's DYNVARS.h common block (model/inc/DYNVARS.h:
uVel,vVel,wVel,theta,salt,etaN + Adams-Bashforth tendency history
guNm1/gvNm1/gtNm1/gsNm1) plus SURFACE.h's etaH/dEtaHdt. Forcing mirrors
FFIELDS.h's simple-forcing fields (fu,fv,Qnet,Qsw,EmPmR,saltFlux,...).

Everything is a registered dataclass pytree so the whole timestep is a pure
jit-compiled State -> State function, scan-able and differentiable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mitgcm_tpu.core.config import Config
from mitgcm_tpu.core.grid import Grid


@dataclass
class State:
    uVel: jnp.ndarray    # [nr, nyp, nxp] at W (west face) points
    vVel: jnp.ndarray    # [nr, nyp, nxp] at S (south face) points
    wVel: jnp.ndarray    # [nr, nyp, nxp] at upper faces
    theta: jnp.ndarray   # [nr, nyp, nxp]
    salt: jnp.ndarray
    etaN: jnp.ndarray    # [nyp, nxp]
    etaH: jnp.ndarray
    dEtaHdt: jnp.ndarray
    guNm1: jnp.ndarray   # AB tendency history
    gvNm1: jnp.ndarray
    gtNm1: jnp.ndarray
    gsNm1: jnp.ndarray
    # second AB history slot (model/src/adams_bashforth3.F two-buffer
    # scheme); zeros when running plain AB-2
    guNm2: jnp.ndarray
    gvNm2: jnp.ndarray
    gtNm2: jnp.ndarray
    gsNm2: jnp.ndarray
    # CD-scheme D-grid velocities (pkg/cd_code/CD_CODE_VARS.h); zeros when
    # useCDscheme is off
    uVelD: jnp.ndarray
    vVelD: jnp.ndarray
    uNM1: jnp.ndarray
    vNM1: jnp.ndarray
    etaNm1: jnp.ndarray
    # nonlinear free surface (r*): previous etaH for the old-time-level
    # thickness factors, and the total hydrostatic potential used by
    # pressure-dependent equations of state (selectP_inEOS_Zc=2)
    etaHm1: jnp.ndarray
    totPhiHyd: jnp.ndarray
    # passive tracers [nptr, nr, ny, nx] (pkg/ptracers); zero-size if unused
    pTr: jnp.ndarray
    gPtrNm1: jnp.ndarray
    # GGL90 prognostic turbulent kinetic energy (pkg/ggl90/GGL90.h);
    # zeros when useGGL90 is off
    GGL90TKE: jnp.ndarray = None
    IDEMIX_E: jnp.ndarray = None   # internal-wave energy (ggl90_idemix.F)
    # SOM (Prather) sub-grid moments per tracer, [9, nr, ny, nx]
    # (pkg/generic_advdiff/GAD_SOM_VARS.h som_T/som_S); zero-size unless
    # temp/saltAdvScheme is 80/81
    somT: jnp.ndarray = None
    somS: jnp.ndarray = None
    # sea ice prognostic state (pkg/seaice/SEAICE.h); zero-size unless
    # useSEAICE
    uIce: jnp.ndarray = None
    vIce: jnp.ndarray = None
    siAREA: jnp.ndarray = None
    siHEFF: jnp.ndarray = None
    siHSNOW: jnp.ndarray = None
    siHSALT: jnp.ndarray = None
    siTICES: jnp.ndarray = None      # [multDim, ny, nx]
    SItracer: jnp.ndarray = None     # [nTr, ny, nx]
    siSigma: jnp.ndarray = None      # [3, ny, nx] EVP sigma1/2/12 ([0,..])
    dicPH: jnp.ndarray = None        # [ny, nx] pkg/dic surface pH
    # pkg/dic totcost accumulator (DIC_COST.h totcost, dic_cost.F:57):
    # running sum of FluxCO2*rA*maskC*dt — the ALLOW_DIC_COST objective
    # (cost_final.F:199 'fc = totcost'). Scalar; zero when dic is off.
    dicCost: jnp.ndarray = None
    # pkg/thsice Winton 3-layer state (THSICE_VARS.h)
    thIceMask: jnp.ndarray = None
    thIceH: jnp.ndarray = None
    thSnowH: jnp.ndarray = None
    thSnowAge: jnp.ndarray = None
    thTsrf: jnp.ndarray = None
    thTice1: jnp.ndarray = None
    thTice2: jnp.ndarray = None
    thQice1: jnp.ndarray = None
    thQice2: jnp.ndarray = None
    # non-hydrostatic pressure + wVel AB tendency history
    # (model/inc/NH_VARS.h phi_nh/gwNm1/gwNm2); zero-size when hydrostatic
    phi_nh: jnp.ndarray = None
    gwNm1: jnp.ndarray = None
    gwNm2: jnp.ndarray = None
    # P-E+R seen by the tracer surface forcing (SURFACE.h PmEpR): set by
    # the PREVIOUS step's integr_continuity — lags EmPmR by one step on
    # synchronous realFreshWaterFlux runs (external_forcing_surf.F:129);
    # staggered runs reset it to -EmPmR each step instead
    PmEpR: jnp.ndarray = None
    # hydrostatic potential at the low-r boundary (diags_phi_rlow.F):
    # sea-surface geopotential in p-coords; the sea-ice tilt force reads
    # the previous DYNAMICS' value (seaice_dynsolver.F:225-230)
    phiHydLow: jnp.ndarray = None
    # pkg/land prognostic state (LAND_VARS.h); zero-size unless useLand
    landEnthalp: jnp.ndarray = None   # [2, ny, nx]
    landW: jnp.ndarray = None         # [2, ny, nx] soil moisture
    landT: jnp.ndarray = None         # [2, ny, nx] ground temperature
    landSkinT: jnp.ndarray = None
    landHSnow: jnp.ndarray = None
    landSnowAge: jnp.ndarray = None


jax.tree_util.register_dataclass(
    State,
    data_fields=[f.name for f in dataclasses.fields(State)],
    meta_fields=[],
)


@dataclass
class Forcing:
    """Surface forcing records: leading axis = time record (1 when
    constant; externForcingCycle/Period records when periodic —
    model/src/external_fields_load.F)."""

    fu: jnp.ndarray       # zonal wind stress [N/m2] at W points
    fv: jnp.ndarray       # meridional wind stress at S points
    Qnet: jnp.ndarray     # net upward surface heat flux [W/m2]
    Qsw: jnp.ndarray      # shortwave (positive up, <=0 into ocean)
    EmPmR: jnp.ndarray    # evap - precip - runoff [kg/m2/s]
    saltFlux: jnp.ndarray
    SST: jnp.ndarray      # climatological relaxation targets
    SSS: jnp.ndarray
    # pkg/exf atmospheric state (ALLOW_ATM_TEMP / ALLOW_ATM_WIND /
    # ALLOW_DOWNWARD_RADIATION): inputs to the in-jit bulk formulae
    atemp: jnp.ndarray    # air temperature at ht [K]
    aqh: jnp.ndarray      # specific humidity at hq [kg/kg]
    uwind: jnp.ndarray    # 10-m wind [m/s] (A-grid)
    vwind: jnp.ndarray
    precip: jnp.ndarray   # precipitation [m/s]
    swdown: jnp.ndarray   # downward shortwave [W/m2]
    lwdown: jnp.ndarray   # downward longwave [W/m2]
    runoff: jnp.ndarray   # runoff [m/s]
    # pkg/exf: per-field piecewise-linear time-knot tables (name ->
    # [nrec] model times); fields listed here interpolate between
    # consecutive records at these knots instead of the periodic-cycle
    # logic (see model/exf.py)
    tknots: dict
    wspeed: jnp.ndarray = None   # exf wind speed (bulk formulae input)
    evap: jnp.ndarray = None     # exf evaporation [m/s]
    runoftemp: jnp.ndarray = None  # runoff temperature [degC] (ALLOW_RUNOFTEMP)
    # ATMOSPHERIC_LOADING: surface pressure loading [Pa] (pLoadFile /
    # exf apressure) added to phi0surf (external_forcing_surf.F:360-377)
    pLoad: jnp.ndarray = None
    # ALLOW_3D_DIFFKR: additive 3-D vertical-diffusivity anomaly
    # [nr, ny, nx] on top of the diffKrNr profile — the xx_diffkr control
    # target (ctrl_map_ini_genarr.F:399-402)
    diffKr3d: jnp.ndarray = None
    # pkg/dic alpha (maximum-production-rate) anomaly [ny, nx]: the
    # xx_alpha genarr2d control target (ctrl_map_ini_genarr.F:325-326
    # CTRL_MAP_GENARR2D( alpha, ... ) — additive on the DicParams
    # alphaUniform base field). None when no control is active.
    dicAlpha: jnp.ndarray = None


jax.tree_util.register_dataclass(
    Forcing,
    data_fields=[f.name for f in dataclasses.fields(Forcing)],
    meta_fields=[],
)


def init_state(cfg: Config, grid: Grid, dtype=jnp.float64) -> State:
    """Cold-start state (model/src/ini_dynvars.F + ini_fields.F):
    rest, theta/salt = reference profiles (masked), eta = 0.
    Cubed-sphere runs stack the faces along j (nFaces j-blocks)."""
    nyp = cfg.nFaces * (cfg.ny + 2 * cfg.oly)
    nxp = cfg.nx + 2 * cfg.olx
    z3 = jnp.zeros((cfg.nr, nyp, nxp), dtype=dtype)
    z2 = jnp.zeros((nyp, nxp), dtype=dtype)
    tref = jnp.asarray(cfg.tRef, dtype=dtype)[:, None, None]
    sref = jnp.asarray(cfg.sRef, dtype=dtype)[:, None, None]
    theta = tref * jnp.ones_like(z3) * grid.maskC
    salt = sref * jnp.ones_like(z3) * grid.maskC
    nptr = n_ptracers(cfg)
    zp = jnp.zeros((nptr, cfg.nr, nyp, nxp), dtype=dtype)
    z0 = jnp.zeros((0,), dtype=dtype)
    somT = (jnp.zeros((9, cfg.nr, nyp, nxp), dtype=dtype)
            if cfg.tempAdvScheme in (80, 81) else z0)
    somS = (jnp.zeros((9, cfg.nr, nyp, nxp), dtype=dtype)
            if cfg.saltAdvScheme in (80, 81) else z0)
    return State(
        uIce=z2 if cfg.useSEAICE else z0,
        vIce=z2 if cfg.useSEAICE else z0,
        siAREA=z2 if cfg.useSEAICE else z0,
        siHEFF=z2 if cfg.useSEAICE else z0,
        siHSNOW=z2 if cfg.useSEAICE else z0,
        siHSALT=z2 if cfg.useSEAICE else z0,
        siTICES=z0, SItracer=z0, siSigma=z0, dicPH=z0,
        dicCost=jnp.zeros((), dtype=dtype),
        thIceMask=z0, thIceH=z0, thSnowH=z0, thSnowAge=z0, thTsrf=z0,
        thTice1=z0, thTice2=z0, thQice1=z0, thQice2=z0,
        uVel=z3, vVel=z3, wVel=z3, theta=theta, salt=salt,
        etaN=z2, etaH=z2, dEtaHdt=z2, PmEpR=z2,
        guNm1=z3, gvNm1=z3, gtNm1=z3, gsNm1=z3,
        guNm2=z3, gvNm2=z3, gtNm2=z3, gsNm2=z3,
        uVelD=z3, vVelD=z3, uNM1=z3, vNM1=z3, etaNm1=z2,
        etaHm1=z2, totPhiHyd=z3, phiHydLow=z2,
        landEnthalp=z0, landW=z0, landT=z0, landSkinT=z0,
        landHSnow=z0, landSnowAge=z0,
        pTr=zp, gPtrNm1=zp, GGL90TKE=z3, IDEMIX_E=z3, somT=somT,
        somS=somS,
        phi_nh=z3 if cfg.nonHydrostatic else z0,
        gwNm1=z3 if cfg.nonHydrostatic else z0,
        gwNm2=z3 if (cfg.nonHydrostatic and cfg.useAB3) else z0,
    )


def n_ptracers(cfg: Config) -> int:
    if not cfg.usePTRACERS or cfg.ptracers is None:
        return 0
    return int(cfg.ptracers.get("ptracers_numinuse", 0))


def zero_forcing(cfg: Config, dtype=jnp.float64) -> Forcing:
    nyp = cfg.nFaces * (cfg.ny + 2 * cfg.oly)
    nxp = cfg.nx + 2 * cfg.olx
    z2 = jnp.zeros((1, nyp, nxp), dtype=dtype)
    return Forcing(tknots={}, atemp=z2, aqh=z2, uwind=z2, vwind=z2,
                   precip=z2, swdown=z2, lwdown=z2, runoff=z2,
                   fu=z2, fv=z2, Qnet=z2, Qsw=z2, EmPmR=z2,
                   saltFlux=z2, SST=z2, SSS=z2, wspeed=z2, evap=z2,
                   runoftemp=z2)
