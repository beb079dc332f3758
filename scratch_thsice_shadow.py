"""Scalar single-cell shadow of pkg/thsice thermodynamics, transcribed
directly from the Fortran (thsice_solve4temp.F / thsice_get_exf.F /
thsice_calc_thickn.F / thsice_extend.F / thsice_step_fwd.F) to diff
against the vectorized JAX implementation at one cell."""
import math
import pickle

with open("/tmp/thsice_cell_inputs.pkl", "rb") as f:
    IN = {k: float(v) for k, v in pickle.load(f).items()}
print("inputs:", {k: round(v, 6) for k, v in IN.items()})

# constants (THSICE defaults + deck data.ice)
rhos, rhoi, rhosw, rhofw = 330.0, 900.0, 1030.0, 1000.0
cpIce, cpWater = 2106.0, 3986.0
kIce, kSnow = 2.03, 0.30
bMeltCoef = 0.006
Lfresh = qsnow = 3.34e5
albIceMax = albIceMin = 0.6
hAlbIce, hAlbSnow = 0.5, 0.3
albColdSnow, albWarmSnow, tempSnowAlb, albOldSnow = 0.85, 0.70, -10.0, 0.55
hNewSnowAge, snowAgTime = 2.0e-3, 4.32e6
i0swFrac, ksolar = 0.3, 1.5
dhSnowLin = 0.1
saltIce = 4.0
S_winton, mu_Tf = 1.0, 0.054
Tmlt1 = -mu_Tf * S_winton
Terrmax, nitMaxTsf = 0.5, 20
hIceMin, hiMax, hsMax = 0.01, 10.0, 10.0
iceMaskMax, iceMaskMin = 1.0, 0.001
fracEnMelt, fracEnFreez = 0.4, 0.4
hThinIce, hThickIce = 0.2, 2.5
hNewIceMax = 1.0
floodFac = (rhosw - rhoi) / rhos
dt = 3600.0
ocean_deltaT = 3600.0
celsius2K = 273.15

# exf bulk constants (exf_constants.h defaults)
atmrho, atmcp = 1.2, 1005.0
flamb, flami = 2500000.0, 334000.0
humid_fac, gamma_blk = 0.606, 0.01
cvapor_fac_ice, cvapor_exp_ice = 11637800.0, 5897.8
stefanBoltzmann = 5.67e-8
ice_emissivity = snow_emissivity = 0.95  # exf default 0.95*1.0?
ht = 2.0
exf_iceCe = exf_iceCh = 1.63e-3

cell = dict(
    iceMask=IN["thIceMask"], hIce=IN["thIceH"], hSnow=IN["thSnowH"],
    snowAge=IN["thSnowAge"], Tsrf=IN["thTsrf"], Tic1=IN["thTice1"],
    Tic2=IN["thTice2"], q1=IN["thQice1"], q2=IN["thQice2"])


def get_exf(hSnow, tsfCel):
    """thsice_get_exf.F fixed-coeff branch (useStabilityFct_overIce=F)."""
    emiss = snow_emissivity if hSnow > 0.3 else ice_emissivity
    Tsf = tsfCel + celsius2K
    Ts2 = Tsf * Tsf
    tmpbulk = cvapor_fac_ice * math.exp(-cvapor_exp_ice / Tsf)
    ssq = tmpbulk / atmrho
    deltap = IN["atemp"] + gamma_blk * ht - Tsf
    delq = IN["aqh"] - ssq
    dEvdT = ssq * cvapor_exp_ice / Ts2
    flwup = emiss * stefanBoltzmann * Ts2 * Ts2
    dflwupdT = emiss * stefanBoltzmann * Ts2 * Tsf * 4.0
    flwNet_dwn = emiss * IN["lwdown"] - flwup
    dFlxdT = -dflwupdT
    flxExcSw = flwNet_dwn
    wsm = IN["wspeed"]
    lath = flamb + flami
    tau = atmrho * exf_iceCe * wsm
    evapLoc = -tau * delq
    hl = -lath * evapLoc
    hs = atmcp * atmrho * exf_iceCh * wsm * deltap
    dEvdT = tau * dEvdT
    dflhdT = -lath * dEvdT
    dfshdT = -atmcp * atmrho * exf_iceCh * wsm
    dFlxdT = dFlxdT + dfshdT + dflhdT
    flxExcSw = flxExcSw + hs + hl
    return flxExcSw, dFlxdT, evapLoc, dEvdT


def solve4temp(icMask, hIce, hSnow, tFrz, flxSW, tSrf, qIc1, qIc2):
    """thsice_solve4temp.F, scalar."""
    # fractional snow cover :258-266
    if hSnow > icMask * dhSnowLin:
        frsnow = 1.0
    else:
        frsnow = hSnow / dhSnowLin / icMask
        if frsnow > 0.0:
            frsnow = math.sqrt(frsnow)
    fswpen = flxSW * (1.0 - frsnow) * i0swFrac
    fswocn = fswpen * math.exp(-ksolar * hIce)
    fswint = fswpen - fswocn
    fswdn = flxSW - fswpen
    flxAtm = flxSW
    flxSW_out = fswocn
    sHeat = fswdn
    k12 = 4.0 * kIce * kSnow / (kSnow * hIce + 4.0 * kIce * hSnow)
    k32 = 2.0 * kIce / hIce
    a1 = cpIce
    b1 = qIc1 + (cpWater - cpIce) * Tmlt1 - Lfresh
    c1 = Lfresh * Tmlt1
    tIc1 = 0.5 * (-b1 - math.sqrt(b1 * b1 - 4.0 * a1 * c1)) / a1
    tIc2 = (Lfresh - qIc2) / cpIce
    a10 = (rhoi * cpIce * hIce / (2.0 * dt)
           + k32 * (4.0 * dt * k32 + rhoi * cpIce * hIce)
           / (6.0 * dt * k32 + rhoi * cpIce * hIce))
    b10 = (-hIce * (rhoi * cpIce * tIc1 + rhoi * Lfresh * Tmlt1 / tIc1)
           / (2.0 * dt)
           - k32 * (4.0 * dt * k32 * tFrz + rhoi * cpIce * hIce * tIc2)
           / (6.0 * dt * k32 + rhoi * cpIce * hIce)
           - fswint)
    c10 = rhoi * Lfresh * hIce * Tmlt1 / (2.0 * dt)
    flx0, _dF0, evap_0, _dE0 = get_exf(hSnow, 0.0)
    dTsrf = Terrmax
    flxTexSW = dFlxdT = evapT = dEvdT = 0.0
    for k in range(nitMaxTsf):
        if abs(dTsrf) < Terrmax:
            break
        flxTexSW, dFlxdT, evapT, dEvdT = get_exf(hSnow, tSrf)
        flxNet = sHeat + flxTexSW
        a1 = a10 - k12 * dFlxdT / (k12 - dFlxdT)
        b1 = b10 - k12 * (flxNet - dFlxdT * tSrf) / (k12 - dFlxdT)
        c1 = c10
        tIc1 = -(b1 + math.sqrt(b1 * b1 - 4.0 * a1 * c1)) / (2.0 * a1)
        dTsrf = (flxNet + k12 * (tIc1 - tSrf)) / (k12 - dFlxdT)
        TsfTmp = tSrf + dTsrf
        if TsfTmp > 0.0:
            a1 = a10 + k12
            b1 = b10
            tIc1 = (-b1 - math.sqrt(b1 * b1 - 4.0 * a1 * c10)) / (2.0 * a1)
            tSrf = 0.0
            flxTexSW = flx0
            evapT = evap_0
            dTsrf = 0.0
        else:
            tSrf = TsfTmp
    # :566-573
    tIc2Tmp = tIc2
    k32 = 2.0 * kIce / hIce
    tIc2 = ((2.0 * dt * k32 * (tIc1 + 2.0 * tFrz)
             + rhoi * cpIce * hIce * tIc2Tmp)
            / (6.0 * dt * k32 + rhoi * cpIce * hIce))
    fct = k12 * (tSrf - tIc1)
    flxCnB = 4.0 * kIce * (tIc2 - tFrz) / hIce
    flxNet = sHeat + flxTexSW + dFlxdT * dTsrf
    evpAtm = evapT + dEvdT * dTsrf
    flxAtm = flxAtm + flxTexSW + dFlxdT * dTsrf + evpAtm * Lfresh
    sHeat = flxNet - fct
    qIc1 = (-cpWater * Tmlt1 + cpIce * (Tmlt1 - tIc1)
            + Lfresh * (1.0 - Tmlt1 / tIc1))
    qIc2 = -cpIce * tIc2 + Lfresh
    return (flxSW_out, tSrf, qIc1, qIc2, tIc1, tIc2, sHeat, flxCnB,
            flxAtm, evpAtm)


def calc_thickn(iceMask, tFrz, tOce, v2oc, snowP, prcAtm, sHeat, flxCnB,
                icFrac, hIce, hSnow, tSrf, qIc1, qIc2, frwAtm, fzMlOc,
                flx2oc):
    """thsice_calc_thickn.F scalar (POWERLAW, powerLaw=5)."""
    cpchr = cpWater * rhosw * bMeltCoef
    lowIcFrac1 = iceMaskMin * 1.01
    lowIcFrac2 = iceMaskMin * 1.10
    powerLaw = 5
    rec_pLaw = 1.0 / powerLaw
    c1Mlt = fracEnMelt ** rec_pLaw
    c2Mlt = (1.0 - fracEnMelt) ** rec_pLaw
    aMlt = (c1Mlt + c2Mlt) / (hThickIce - hThinIce)
    hMlt = hThinIce + c2Mlt / aMlt
    c1Frz = fracEnFreez ** rec_pLaw
    c2Frz = (1.0 - fracEnFreez) ** rec_pLaw
    aFrz = (c1Frz + c2Frz) / (hThickIce - hThinIce)
    hFrz = hThinIce + c2Frz / aFrz
    evapLoc = frwAtm
    esurp = 0.0
    xxMlt = (aMlt * (hIce - hMlt)) ** powerLaw
    xxFrz = (aFrz * (hIce - hFrz)) ** powerLaw
    xxMlt = fracEnMelt - xxMlt
    xxFrz = fracEnFreez - xxFrz
    enFrcMlt = max(0.0, min(xxMlt, 1.0))
    enFrcFrz = max(0.0, min(xxFrz, 1.0))
    if fzMlOc >= 0.0:
        Fbot = fzMlOc
        if icFrac < iceMaskMax:
            Fbot = enFrcFrz * fzMlOc
    else:
        ustar = 5.0e-3
        if v2oc != 0.0:
            ustar = math.sqrt(0.00536 * v2oc)
        ustar = max(5.0e-3, ustar)
        Fbot = cpchr * (tFrz - tOce) * ustar
        Fbot = max(Fbot, fzMlOc)
        Fbot = min(Fbot, 0.0)
    mwater0 = rhos * hSnow + rhoi * hIce
    msalt0 = rhoi * hIce * saltIce
    # frace (:436-442 powerlaw)
    if fracEnMelt == 0.0:
        frace = 0.0
    else:
        frace = (icFrac - lowIcFrac1) / (lowIcFrac2 - iceMaskMin)
        frace = min(enFrcMlt, max(0.0, frace))
    if sHeat > 0.0:
        etop = (1.0 - frace) * sHeat * dt
        etope = frace * sHeat * dt
    else:
        etop = 0.0
        etope = 0.0
        esurp = sHeat * dt
    ebot = (flxCnB - Fbot) * dt
    if ebot > 0.0:
        ebote = frace * ebot
        ebot = ebot - ebote
    else:
        ebote = 0.0
    # initial layers (:507-523)
    qicen = [qIc1, qIc2]
    hnew = [hIce / 2.0, hIce / 2.0]
    hSnow1 = hSnow
    # snow melt from top (:527-539)
    if etop > 0.0 and hSnow1 > 0.0:
        rq = rhos * qsnow
        rqh = rq * hSnow1
        if etop < rqh:
            hSnow1 = hSnow1 - etop / rq
            etop = 0.0
        else:
            hSnow1 = 0.0
            etop = etop - rqh
    # top melt layers (:541-560)
    for k in range(2):
        if etop > 0.0:
            rq = rhoi * qicen[k]
            rqh = rq * hnew[k]
            if etop < rqh:
                hnew[k] = hnew[k] - etop / rq
                etop = 0.0
            else:
                hnew[k] = 0.0
                etop = etop - rqh
    if etop < 0.0:
        etop = 0.0
    frzSeaWat = 0.0
    # bottom growth (:589-601)
    if ebot < 0.0:
        qbot = -cpIce * tFrz + Lfresh
        dhi = -ebot / (qbot * rhoi)
        ebot = 0.0
        qicen[1] = ((hnew[1] * qicen[1] + dhi * qbot) / (hnew[1] + dhi))
        hnew[1] = hnew[1] + dhi
        frzSeaWat = rhoi * dhi / dt
    # bottom melt (:616-668)
    for k in (1, 0):
        if ebot > 0.0 and hnew[k] > 0.0:
            rq = rhoi * qicen[k]
            rqh = rq * hnew[k]
            if ebot < rqh:
                hnew[k] = hnew[k] - ebot / rq
                ebot = 0.0
            else:
                hnew[k] = 0.0
                ebot = ebot - rqh
    # bottom-melt leftover goes to snow (:670-682)
    if ebot > 0.0 and hSnow1 > 0.0:
        rq = rhos * qsnow
        rqh = rq * hSnow1
        if ebot < rqh:
            hSnow1 = hSnow1 - ebot / rq
            ebot = 0.0
        else:
            hSnow1 = 0.0
            ebot = ebot - rqh
    esurp_add = -ebot  # remaining goes back to the ocean as esurp? (:684)
    # NOTE: reference adds remaining ebot to esurp: esurp = esurp - ebot?
    # thsice_calc_thickn.F:684-686: esurp(i,j) = esurp(i,j) - ebot(i,j)
    esurp = esurp - ebot
    ebot = 0.0
    # evaporation / sublimation (:700-800)
    if evapLoc > 0.0:
        # evap from snow first
        dhs = evapLoc / rhos * dt
        if hSnow1 > 0.0:
            if dhs < hSnow1:
                hSnow1 = hSnow1 - dhs
                evapLoc = 0.0
            else:
                evapLoc = evapLoc - hSnow1 * rhos / dt
                hSnow1 = 0.0
        if evapLoc > 0.0:
            for k in range(2):
                if evapLoc > 0.0 and hnew[k] > 0.0:
                    dhi = evapLoc / rhoi * dt
                    if dhi >= hnew[k]:
                        evapLoc = evapLoc - hnew[k] * rhoi / dt
                        esurp = esurp + hnew[k] * rhoi * (Lfresh - qicen[k])
                        hnew[k] = 0.0
                    else:
                        hq = hnew[k] * qicen[k] - dhi * Lfresh
                        hnew[k] = hnew[k] - dhi
                        qicen[k] = hq / hnew[k]
                        evapLoc = 0.0
    # NOTE transcription of :775-800: evap removes latent-heat-adjusted
    # enthalpy; check against Fortran below in main diff.
    h1, h2 = hnew
    return dict(Fbot=Fbot, etop=etop, etope=etope, ebot=ebot, ebote=ebote,
                esurp=esurp, h1=h1, h2=h2, q1=qicen[0], q2=qicen[1],
                hSnow=hSnow1, frace=frace, enFrcFrz=enFrcFrz,
                frzSeaWat=frzSeaWat)


# ---- drive one step like thsice_step_temp + step_fwd ----
tOce = IN["theta"]
sOce = IN["salt"]
on = cell["iceMask"] > 0.0
alb = albIceMax + (albIceMin - albIceMax) * math.exp(-cell["hIce"] / hAlbIce)
# (snow-free: albedo = const 0.6)
flxSW0 = IN["swdown"]
icFlxSW = flxSW0 * (1.0 - alb)
tFrzOce = -mu_Tf * sOce
(flxSW_oce, tSrf, q1, q2, tIc1, tIc2, sHeat, flxCnB, flxAtm,
 evpAtm) = solve4temp(cell["iceMask"], cell["hIce"], cell["hSnow"],
                      tFrzOce, icFlxSW, cell["Tsrf"], cell["q1"],
                      cell["q2"])
print("\n-- solve4temp --")
for nm, v in (("tSrf", tSrf), ("tIc1", tIc1), ("tIc2", tIc2),
              ("sHeat", sHeat), ("flxCnB", flxCnB), ("flxAtm", flxAtm),
              ("evpAtm", evpAtm), ("flxSW_oce", flxSW_oce), ("q1", q1),
              ("q2", q2)):
    print(f"  {nm:10s} = {v:.12e}")

cphm = cpWater * rhosw * 10.0
frzmlt = (tFrzOce - tOce) * cphm / ocean_deltaT
print("frzmlt =", frzmlt)
v2oc = 0.5 * (IN["uVel"] ** 2 * 2 + IN["vVel"] ** 2 * 2)
res = calc_thickn(cell["iceMask"], tFrzOce, tOce, v2oc, 0.0, 0.0, sHeat,
                  flxCnB, cell["iceMask"], cell["hIce"], cell["hSnow"],
                  tSrf, q1, q2, evpAtm, frzmlt, flxSW_oce)
print("\n-- calc_thickn --")
for nm, v in res.items():
    print(f"  {nm:10s} = {v:.12e}")
print("hIce' =", res["h1"] + res["h2"])
