"""Probe: does the in_p step-2 LSR converge, and does WFAU freeze?"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import os, shutil, tempfile
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.model import step as step_mod
import jax.numpy as jnp

BASE = "/root/reference/verification/global_ocean.cs32x15"
DIR = BASE + "/input.in_p"
GRID_DIR = os.pathsep.join([
    DIR, BASE + "/input.seaice", BASE + "/input.icedyn", BASE + "/input",
    "/root/reference/verification/tutorial_held_suarez_cs/input"])
exp = Experiment.from_dir(DIR, nx=32, ny=32, nr=15, grid_dir=GRID_DIR,
                          strict_config=False)
exp.run(1)
print("step 1 done", flush=True)
exp.seaice.debug = True
# eager step 2
state, diag = step_mod.forward_step(
    exp.cfg, exp.grid, exp.op, exp.state, exp.forcing, exp.cfg.nIter0 + 1,
    kpp=exp.kpp, ggl90=exp.ggl90, vmix=exp.vmix, opps=exp.opps,
    seaice=exp.seaice, obcs=exp.obcs, op3=exp.op3, rbcs=exp.rbcs,
    aim=exp.aim, zonfilt=exp.zonfilt,
    fill=exp.cs_fill.fill, fill_uv=exp.cs_fill.fill_uv,
    fill_uv_cg=exp.cs_fill.fill_uv_cg)
for n, d in enumerate(exp.seaice.last_lsr):
    print(f"picard iter {n}: ICOUNT1={int(d[0])} ICOUNT2={int(d[1])} "
          f"S1A={float(d[2]):.3e} S2A={float(d[3]):.3e}")
