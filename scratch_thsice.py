"""Scratch: offline_exf_seaice/input.thsice vs results/output.thsice.txt."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import math
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.utils import refout

DIR = "/root/reference/verification/offline_exf_seaice"
exp = Experiment.from_dir(DIR + "/input.thsice",
                          grid_dir=os.pathsep.join(
                              [DIR + "/input.thsice", DIR + "/input"]))
print("thsice:", exp.thsice)

import re
_MON = re.compile(r"%MON\s+(\S+)\s+=\s+([-\d.E+]+)")


def parse_thsi(path, dt=3600.0):
    """thSI monitor blocks keyed by iter (= time_sec/dt)."""
    out = {}
    cur = None
    for line in open(path, errors="replace"):
        m = _MON.search(line)
        if not m:
            continue
        name, val = m.group(1), float(m.group(2).replace("E", "e"))
        if name == "thSI_time_sec":
            cur = out.setdefault(int(round(val / dt)), {})
        elif name.startswith("thSI_") and cur is not None:
            cur[name] = val
        elif not name.startswith("thSI_"):
            cur = None
    return out


refd = parse_thsi(DIR + "/results/output.thsice.txt")
print("ref thSI monitor iters:", sorted(refd.keys())[:8])


def digits(a, b):
    if a == b:
        return 16.0
    s = max(abs(a), abs(b))
    if s == 0.0:
        return 16.0
    return -math.log10(abs(a - b) / s)


# step-0 monitor (state as initialized)
m0 = exp.monitor_stats()
r0 = refd.get(0, {})
print("== iter 0 ==")
for k in sorted(r0):
    if not k.startswith("thSI_"):
        continue
    o = m0.get(k)
    if o is None:
        print(f"  MISSING {k} ref={r0[k]}")
        continue
    print(f"  {k:24s} ours={o: .10e} ref={r0[k]: .10e} d={digits(o, r0[k]):.1f}")

n = int(os.environ.get("NSTEPS", "10"))
recs = exp.run(n_steps=n)
mN = exp.monitor_stats()
rN = refd.get(n, {})
print(f"== iter {n} ==")
for k in sorted(rN):
    if not k.startswith("thSI_"):
        continue
    o = mN.get(k)
    if o is None:
        print(f"  MISSING {k} ref={rN[k]}")
        continue
    print(f"  {k:24s} ours={o: .10e} ref={rN[k]: .10e} d={digits(o, rN[k]):.1f}")
# also the ocean stats
for k in sorted(rN):
    if k.startswith("dynstat_theta") or k.startswith("theta"):
        o = mN.get(k)
        if o is not None:
            print(f"  {k:24s} ours={o: .10e} ref={rN[k]: .10e} "
                  f"d={digits(o, rN[k]):.1f}")
