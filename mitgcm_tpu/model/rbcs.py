"""pkg/rbcs: relaxation (restoring) boundary conditions.

Reference: pkg/rbcs/rbcs_readparms.F (RBCS_PARM01/02),
rbcs_add_tendency.F (the relaxation tendency, added inside
APPLY_FORCING_T/S/PTR, i.e. as part of the forcing tendency that joins
the AB extrapolation), rbcs_fields_load.F (static fields when
rbcsForcingPeriod=0).  Interior 3-D masks select where each tracer is
relaxed; mask slot irbc = MIN(maskLEN, tracerNum) with maskLEN=3
(RBCS_SIZE.h): slot 1 = temperature, 2 = salinity, 3 = all ptracers.
"""

from __future__ import annotations

import os

import jax.numpy as jnp


class RBCS:
    """Parsed data.rbcs + loaded mask/target fields (host-side setup)."""

    MASK_LEN = 3   # RBCS_SIZE.h maskLEN

    def __init__(self, cfg, grid, dtype, load3d):
        """load3d(fname) -> padded [nr, nyp, nxp] array or None."""
        from mitgcm_tpu.core import nml
        self.cfg = cfg
        path = cfg.find_file("data.rbcs")
        groups = nml.read_namelist(path) if os.path.exists(path) else {}
        p1 = {k.lower(): v for k, v in groups.get("RBCS_PARM01", {}).items()}
        p2 = {k.lower(): v for k, v in groups.get("RBCS_PARM02", {}).items()}

        self.useRBCtemp = bool(p1.get("userbctemp", False))
        self.useRBCsalt = bool(p1.get("userbcsalt", False))
        if p1.get("userbcuvel") or p1.get("userbcvvel"):
            raise NotImplementedError("RBCS momentum relaxation")
        self.tauRelaxT = float(p1.get("taurelaxt", 0.0))
        self.tauRelaxS = float(p1.get("taurelaxs", 0.0))
        self.vanishingTime = float(p1.get("rbcsvanishingtime", 0.0))
        if float(p1.get("rbcsforcingperiod", 0.0)) != 0.0:
            raise NotImplementedError(
                "time-dependent RBCS fields (rbcsForcingPeriod>0)")

        # relaxation masks, one per slot (rbcs_init_fixed.F:40-56)
        self.masks = [None] * self.MASK_LEN
        for irbc in range(1, self.MASK_LEN + 1):
            fname = p1.get(f"relaxmaskfile({irbc})")
            if fname is None and irbc == 1:
                fname = p1.get("relaxmaskfile")
            if fname:
                self.masks[irbc - 1] = load3d(str(fname))

        self.relaxT = None
        self.relaxS = None
        if self.useRBCtemp:
            self.relaxT = load3d(str(p1.get("relaxtfile", "")))
        if self.useRBCsalt:
            self.relaxS = load3d(str(p1.get("relaxsfile", "")))

        # per-ptracer relaxation (RBCS_PARM02)
        self.ptr_tau = {}
        self.ptr_fld = {}
        for k, v in p2.items():
            if k.startswith("userbcptrnum(") and v:
                itr = int(k.split("(")[1].rstrip(")")) - 1
                self.ptr_tau[itr] = float(p2.get(f"taurelaxptr({itr + 1})",
                                                 0.0))
                fn = p2.get(f"relaxptracerfile({itr + 1})")
                self.ptr_fld[itr] = load3d(str(fn)) if fn else None

    def _fac(self, myTime):
        if self.vanishingTime > 0.0:
            return jnp.maximum(0.0, 1.0 - myTime / self.vanishingTime)
        return 1.0

    def _mask(self, tracerNum):
        return self.masks[min(self.MASK_LEN, tracerNum) - 1]

    def tendency_t(self, theta, myTime):
        """rbcs_add_tendency.F tracerNum=1 branch; None if inactive."""
        if not self.useRBCtemp:
            return None
        m = self._mask(1)
        return -m * (self._fac(myTime) / self.tauRelaxT) \
            * (theta - self.relaxT)

    def tendency_s(self, salt, myTime):
        if not self.useRBCsalt:
            return None
        m = self._mask(2)
        return -m * (self._fac(myTime) / self.tauRelaxS) \
            * (salt - self.relaxS)

    def tendency_ptr(self, itr, ptr, myTime):
        """rbcs_add_tendency.F tracerNum=2+itr+1 branch."""
        if itr not in self.ptr_tau:
            return None
        m = self._mask(3 + itr)
        return -m * (self._fac(myTime) / self.ptr_tau[itr]) \
            * (ptr - self.ptr_fld[itr])
