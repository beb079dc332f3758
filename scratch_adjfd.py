"""FD-vs-AD self-consistency for tracer_adjsens at the grdchk points."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.ad import estim

DIR = "/root/reference/verification/tutorial_tracer_adjsens"
exp = Experiment.from_dir(DIR + "/input_ad", grid_dir=os.pathsep.join(
    [DIR + "/input_ad", "/root/reference/verification/exp2/input",
     "/root/reference/verification/isomip/input_ad"]), strict_config=True)
prob = estim.CtrlProblem(exp, n_steps=4)
J = jax.jit(prob.objective())
xx0 = prob.xx0()
oly, olx = exp.cfg.oly, exp.cfg.olx
eps = 1.0e-4
i, j, k = 15, 5, 4
idx = (k - 1, oly + j - 1, olx + i - 1)
xp = dict(xx0); xp["xx_ptr1"] = xx0["xx_ptr1"].at[idx].add(eps)
xm = dict(xx0); xm["xx_ptr1"] = xx0["xx_ptr1"].at[idx].add(-eps)
fp = float(J(xp)); fm = float(J(xm)); f0 = float(J(xx0))
print(f"fc0 = {f0:.14e}")
print(f"fc+ = {fp:.14e}  fc- = {fm:.14e}")
print(f"fd grad = {(fp - fm) / (2 * eps):.10e}")
print("ref: fc 1.84102723380947E+14 adj -2.14737521329909E+07 "
      "fd -2.14737500000000E+07")
