"""tutorial_dic_adjoffline adjoint probe: CtrlProblem J + grad vs
results/output_adm.txt grdchk table."""
import math
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_enable_x64", True)

REF = "/root/reference/verification"
DIR = f"{REF}/tutorial_dic_adjoffline"

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.ad.estim import CtrlProblem

exp = Experiment.from_dir(
    os.path.join(DIR, "input_ad"), nx=128, ny=64, nr=15,
    strict_config=False,
    grid_dir=os.pathsep.join([os.path.join(DIR, "input_ad"),
                              f"{REF}/tutorial_global_oce_biogeo/input",
                              f"{REF}/isomip/input_ad"]))
prob = CtrlProblem(exp, n_steps=5)
print("ctrls:", [(c.kind, c.name) for c in prob.ctrls], flush=True)
print("cost fns:", len(prob.cost_fns), "step:", len(prob.step_cost_fns),
      flush=True)

t0 = time.time()
val = prob.value()
print(f"J = {val:.12e} ref -9.44034170278785E+11 "
      f"({time.time()-t0:.0f}s)", flush=True)

t0 = time.time()
fc, g = prob.gradient()
print(f"fc = {float(fc):.12e} ({time.time()-t0:.0f}s)", flush=True)

REF_ADJ = [2.8561523939480e17, 2.8873492037526e17, 2.7138905325759e17,
           2.5480633978087e17, 2.3447843691150e17]


def digits(a, b):
    if a == b:
        return 16.0
    s = max(abs(a), abs(b))
    return 16.0 if s == 0 else -math.log10(abs(a - b) / s)


cfg = exp.cfg
import numpy as np
ga = np.asarray(g["xx_alpha"])
for n in range(5):
    ours = ga[cfg.oly + 10 - 1, cfg.olx + n]
    print(f"i={n+1} j=10: adj={ours:.10e} ref={REF_ADJ[n]:.10e} "
          f"d={digits(ours, REF_ADJ[n]):.1f}", flush=True)
print("fc digits:", digits(float(fc), -9.44034170278785e11), flush=True)
