"""Sensitivity of in_p step-1 wvel_mean to physics toggles."""
import os, shutil, tempfile
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from mitgcm_tpu.model.experiment import Experiment

BASE = "/root/reference/verification/global_ocean.cs32x15"
DIR = BASE + "/input.in_p"
GRID_DIR = os.pathsep.join([
    DIR, BASE + "/input.seaice", BASE + "/input.icedyn", BASE + "/input",
    "/root/reference/verification/tutorial_held_suarez_cs/input"])

MODE = os.environ.get("MODE", "base")
tmp = tempfile.mkdtemp(prefix="sens_")
for f in os.listdir(DIR):
    shutil.copy(os.path.join(DIR, f), tmp)
pkgs = {"useEXF": True, "useCAL": True, "useGGL90": True}
if MODE == "noggl90":
    pkgs["useGGL90"] = False
with open(os.path.join(tmp, "data.pkg"), "w") as f:
    f.write(" &PACKAGES\n" + "".join(
        f" {k}=.{'TRUE' if v else 'FALSE'}.,\n" for k, v in pkgs.items())
        + " &\n")
exp = Experiment.from_dir(tmp, nx=32, ny=32, nr=15, grid_dir=GRID_DIR,
                          strict_config=False)
if MODE == "noidemix":
    exp.ggl90.p["useIDEMIX"] = False
    exp._step_fn = None
if MODE == "novisc4":
    exp.cfg.viscA4 = 0.0
    exp._step_fn = None
if MODE == "nocd":
    exp.cfg.useCDscheme = False
    exp._step_fn = None
if MODE == "noqh":
    exp.cfg.quasiHydrostatic = False
    exp.cfg.use3dCoriolis = False
    exp._step_fn = None
recs = exp.run(1)
r = recs[1]
print(MODE, "wvel_mean", f"{r['dynstat_wvel_mean']:.10e}",
      "wvel_del2", f"{r['dynstat_wvel_del2']:.8e}",
      "uvel_del2", f"{r['dynstat_uvel_del2']:.8e}")
