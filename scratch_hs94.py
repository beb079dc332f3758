"""Scratch: hs94.cs-32x32x5 series digits."""
import os
import numpy as np
import jax.numpy as jnp
from tests.conftest import reference_exp
from mitgcm_tpu.core.state import State
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout
from tests.test_hs94 import hs_forcing_uv, hs_forcing_t, DIR, GRID_DIR

e = Experiment.from_dir(DIR + "/input", nx=32, ny=32, nr=5,
                        grid_dir=GRID_DIR)
cfg, grid = e.cfg, e.grid
cfg.custom_forcing_uv = hs_forcing_uv
cfg.custom_forcing_t = hs_forcing_t
po, kap = cfg.atm_Po, cfg.atm_kappa
rC = np.asarray(grid.rC)
lat = np.deg2rad(np.asarray(grid.yC))
thetaLim = 200.0 / (rC[:, None, None] / po) ** kap
thetaEq = (315.0 - 60.0 * np.sin(lat) ** 2
           - 10.0 * np.log(rC[:, None, None] / po) * np.cos(lat) ** 2)
theta0 = jnp.asarray(np.maximum(thetaLim, thetaEq)) * grid.maskC
e.state = State(**{**e.state.__dict__, "theta": theta0})
cfg.monitorLegacyStats = True
cfg.monitorLegacyWhf = False

ref = refout.parse_monitor_series(DIR + "/results/output.txt")
n = int(os.environ.get("NSTEPS", "5"))
stats = []
for _ in range(n):
    e.run(n_steps=1, collect_monitor=False)
    stats.append(e.monitor_stats())
for step in range(1, n + 1):
    if step >= len(ref):
        break
    r, m = ref[step], stats[step - 1]
    rows = sorted((refout.matching_digits(r[k], m[k]), k, r[k], m[k])
                  for k in sorted(r)
                  if k in m and not k.startswith("time_"))
    print(f"--- step {step} worst:")
    for d, k, rv, mv in rows[:8]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")

# legacy del2 probe on my own step-N fields
import numpy as np
from mitgcm_tpu.diag.monitor import _legacy_del2
cfgx = e.cfg
st = e.state
for nm, arr, hf in (("eta", st.etaN[None], e.grid.maskInC[None]),
                    ("theta", st.theta, e.grid.hFacC),
                    ("uvel", st.uVel, e.grid.hFacW)):
    leg_zero = float(_legacy_del2(cfgx, arr, (hf > 0).astype(arr.dtype), True))
    leg_wrap = float(_legacy_del2(cfgx, arr, (hf > 0).astype(arr.dtype), False))
    print(f"{nm}: legacy(zero_y)={leg_zero:.6e} legacy(wrap)={leg_wrap:.6e} "
          f"ref_step{n}={ref[n].get('dynstat_' + nm + '_del2')}")



