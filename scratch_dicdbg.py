import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

REF = "/root/reference/verification"
DIR = f"{REF}/tutorial_dic_adjoffline"
BIO = f"{REF}/tutorial_global_oce_biogeo"
ISO = f"{REF}/isomip"

from mitgcm_tpu.model.experiment import Experiment

exp = Experiment.from_dir(
    os.path.join(DIR, "input_ad"), nx=128, ny=64, nr=15,
    strict_config=False,
    grid_dir=os.pathsep.join([os.path.join(DIR, "input_ad"),
                              os.path.join(BIO, "input"),
                              os.path.join(ISO, "input_ad")]))
dic = exp.dic
st = exp.state
cfg = exp.cfg

print("pH range:", float(jnp.nanmin(st.dicPH)), float(jnp.nanmax(st.dicPH)),
      "nan:", int(jnp.sum(jnp.isnan(st.dicPH))))
out, ph2, flux = dic.forcing_sep(st.pTr, st.theta, st.salt, st.dicPH, 0.0)
names = ["DIC", "ALK", "PO4", "DOP", "O2", "FE"]
for i, n in enumerate(names):
    a = out[i]
    print(n, "nan:", int(jnp.sum(jnp.isnan(a))),
          "min/max:", float(jnp.nanmin(a)), float(jnp.nanmax(a)))
print("flux nan:", int(jnp.sum(jnp.isnan(flux))),
      "min/max", float(jnp.nanmin(flux)), float(jnp.nanmax(flux)))
print("ph2 nan:", int(jnp.sum(jnp.isnan(ph2))))
m0 = dic.maskC0
cost = float(jnp.sum(flux * exp.grid.rA * m0 * dic.intmask) * cfg.deltaTTracer)
print("step cost:", cost)
# forcing fields
f = dic.fields_at(0.0)
for k, v in f.items():
    print(k, float(jnp.min(v)), float(jnp.max(v)), "nan", int(jnp.sum(jnp.isnan(v))))

# pinpoint NaN source
import jax.numpy as jnp
p = dic.p
grid = exp.grid
pTr, theta, salt, pH = st.pTr, st.theta, st.salt, st.dicPH
ks = cfg.ksurf0
mC = grid.maskC
hFacC = grid.hFacC
drF = grid.drF

sfac = dic._insol(cfg.deltaTClock)
print("sfac nan", int(jnp.sum(jnp.isnan(sfac))))
lit = sfac * (1.0 - f["fice"])
dzh = 0.5 * p.k0 * drF[:, None, None] * hFacC
bioac = []
for k in range(cfg.nr):
    atten = dzh[k] + (dzh[k - 1] if k > 0 else 0.0)
    lit = lit * jnp.exp(-atten)
    po4k = pTr[dic.TR_PO4, k]
    fek = pTr[dic.TR_FE, k]
    thx = po4k / (po4k + p.KPO4)
    thy = fek / (fek + p.KFE)
    thaux = jnp.tanh((thx - thy) * 1.0e6)
    nutlimit = 0.5*(1-thaux)*thx + 0.5*(1+thaux)*thy
    bioac.append(dic.alpha * lit / (lit + p.lit0) * mC[k] * nutlimit)
bioac = jnp.stack(bioac)
print("bioac nan", int(jnp.sum(jnp.isnan(bioac))))
one_m_dop = 1.0 - p.DOPfraction
pflux, export = dic._sink(bioac * one_m_dop,
                          lambda dl, zb: jnp.exp(-p.KRemin * jnp.log(dl / zb)))
print("pflux nan", int(jnp.sum(jnp.isnan(pflux))))
car_s = bioac * p.R_CP * dic.rain_ratio * one_m_dop
cflux, _ = dic._sink(car_s, lambda dl, zb: jnp.exp(-(dl - zb) / p.zca))
print("cflux nan", int(jnp.sum(jnp.isnan(cflux))))
print("rF:", np.asarray(grid.rF)[:5], "drF", np.asarray(drF)[:3])

for i, n in enumerate(["DIC","ALK","PO4","DOP","O2","FE"]):
    a = st.pTr[i]
    print("pTr", n, "nan", int(jnp.sum(jnp.isnan(a))),
          float(jnp.nanmin(a)), float(jnp.nanmax(a)))
print("theta nan", int(jnp.sum(jnp.isnan(st.theta))),
      "salt nan", int(jnp.sum(jnp.isnan(st.salt))))

lit = sfac * (1.0 - f["fice"])
for k in range(cfg.nr):
    atten = dzh[k] + (dzh[k - 1] if k > 0 else 0.0)
    lit = lit * jnp.exp(-atten)
    po4k = pTr[dic.TR_PO4, k]
    fek = pTr[dic.TR_FE, k]
    thx = po4k / (po4k + p.KPO4)
    thy = fek / (fek + p.KFE)
    thaux = jnp.tanh((thx - thy) * 1.0e6)
    print(k, "lit", int(jnp.sum(jnp.isnan(lit))),
          "thx", int(jnp.sum(jnp.isnan(thx))),
          "thy", int(jnp.sum(jnp.isnan(thy))),
          "thaux", int(jnp.sum(jnp.isnan(thaux))),
          "po4min", float(jnp.min(po4k)), "femin", float(jnp.min(fek)))
    if k > 4:
        break
