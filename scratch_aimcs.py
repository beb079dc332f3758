"""Scratch: aim.5l_cs base (AIM + land + SHAP on the cube, pickup start)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from mitgcm_tpu.model.experiment import Experiment, read_pickup
from mitgcm_tpu.utils import refout

DIR = "/root/reference/verification/aim.5l_cs"
exp = Experiment.from_dir(DIR + "/input", nx=32, ny=32, nr=5,
                          strict_config=False)
print("cfg: useAIM", exp.cfg.useAIM, "useLand", exp.cfg.useLand,
      "FM", exp.cfg.aim.aim_useFMsurfBC, "split",
      exp.cfg.aim.aim_splitSIOsFx, "energP", exp.cfg.aim.aim_energPrecip,
      "nIter0", exp.cfg.nIter0, flush=True)
read_pickup(exp, DIR + "/input", exp.cfg.nIter0)
print("pickup loaded", flush=True)
# legacy monitor vintage like hs94/aim.5l_LatLon
exp.cfg.monitorLegacyStats = os.environ.get("LEG","1")=="1"
exp.cfg.monitorLegacyWhf = False
ref = refout.parse_monitor_series(DIR + "/results/output.txt")
n = int(os.environ.get("NSTEPS", "2"))
recs = exp.run(n)
for step in range(n + 1):
    r, m = ref[step], recs[step]
    rows = sorted((refout.matching_digits(r[k], m[k])
                   if m[k] == m[k] else -1, k, r[k], m[k])
                  for k in sorted(r)
                  if k in m and not k.startswith("time_"))
    print(f"--- step {step} worst:")
    for d, k, rv, mv in rows[:40]:
        print(f"   {k:26s} d={d:2d} ref={rv: .10e} mine={mv: .10e}")
