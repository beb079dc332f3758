"""Scratch: tutorial_tracer_adjsens adjoint gradient vs output_adm.txt."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import re
import jax
jax.config.update("jax_enable_x64", True)

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.ad import estim

DIR = "/root/reference/verification/tutorial_tracer_adjsens"
exp = Experiment.from_dir(DIR + "/input_ad", grid_dir=os.pathsep.join(
    [DIR + "/input_ad", "/root/reference/verification/exp2/input",
     "/root/reference/verification/isomip/input_ad"]), strict_config=True)

prob = estim.CtrlProblem(exp, n_steps=4)
print("ctrls:", [(c.name, c.kind) for c in prob.ctrls])
print("step-cost fns:", len(prob.step_cost_fns), "final:", len(prob.cost_fns))

fc, g = prob.gradient()
print(f"fc       = {float(fc):.14e}   ref 1.84102723380947E+14")

# reference grad-res rows: grad-res 0 <n> <i> <j> <k> 1 1 1  adj fd rel
txt = open(DIR + "/results/output_adm.txt", errors="replace").read()
rows = re.findall(
    r"grad-res\s+0\s+(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s+1\s+1\s+1\s+"
    r"([-\d.E+]+)\s+([-\d.E+]+)\s+([-\d.E+]+)", txt)
gp = g["xx_ptr1"]
oly, olx = exp.cfg.oly, exp.cfg.olx
for n, i, j, k, a, b, c in rows:
    i, j, k = int(i), int(j), int(k)
    if k == 0:
        # second row variant: cols are (icomp, 0) — adj/fd/rel
        continue
    print(f"test {n} at (i={i},j={j},k={k})")
for m in re.finditer(
        r"ADM\s+ref_cost_function\s+=\s+([-\dE.+]+)\s*\n.*?"
        r"ADM\s+adjoint_gradient\s+=\s+([-\dE.+]+)\s*\n.*?"
        r"ADM\s+finite-diff_grad\s+=\s+([-\dE.+]+)", txt, re.S):
    print("ADM:", m.group(1), m.group(2), m.group(3))
# our adjoint gradient at the 4 test positions (i=15..18, j=5, k=4)
for i in (15, 16, 17, 18):
    v = float(gp[4 - 1, 5 - 1 + oly, i - 1 + olx])
    print(f"  our dJ/dxx_ptr1 at (i={i},j=5,k=4) = {v:.14e}")
