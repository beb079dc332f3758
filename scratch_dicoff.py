"""tutorial_dic_adjoffline forward probe: 5 offline steps, compare
trcstat monitor + DIC_COST totcost vs results/output_adm.txt."""
import math
import os
import re

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_enable_x64", True)

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
cfg = exp.cfg
print("useOffLine", cfg.useOffLine, "useGCHEM", cfg.useGCHEM,
      "dic", exp.dic is not None, "ad_safe",
      exp.dic.ad_safe if exp.dic else None)

# reference series
txt = open(os.path.join(DIR, "results", "output_adm.txt"),
           errors="replace").read()
blocks = {}
cur = None
for m in re.finditer(r"%MON (\S+)\s+=\s+([-\d.E+]+)", txt):
    k, v = m.group(1), float(m.group(2))
    if k == "trctime_tsnumber":
        cur = blocks.setdefault(int(v), {})
    elif k.startswith("trcstat") and cur is not None:
        cur[k] = v
cost_ref = [float(m.group(2)) for m in re.finditer(
    r"DIC_COST: iter,totcost =\s+(\d+)\s+([-\d.E+]+)", txt)]
print("ref cost per step:", cost_ref)


def digits(a, b):
    if a == b:
        return 16.0
    s = max(abs(a), abs(b))
    return 16.0 if s == 0 else -math.log10(abs(a - b) / s)


stats = [exp.monitor_stats()]
for n in range(5):
    exp.run(n_steps=1, collect_monitor=False)
    stats.append(exp.monitor_stats())
    print(f"step {n+1}: dicCost = {float(exp.state.dicCost):.15e} "
          f"ref {cost_ref[n]:.15e} "
          f"d={digits(float(exp.state.dicCost), cost_ref[n]):.1f}")

for n in range(6):
    it = n
    if it not in blocks:
        continue
    worst = (99, None)
    for k, rv in blocks[it].items():
        if k not in stats[n]:
            print(f"iter {it}: MISSING {k}")
            continue
        d = digits(stats[n][k], rv)
        if d < worst[0]:
            worst = (d, k)
        if d < 9:
            print(f"  iter {it} {k}: ours={stats[n][k]:.10e} ref={rv:.10e} d={d:.1f}")
    print(f"iter {it}: worst {worst[1]} d={worst[0]:.1f} "
          f"({len(blocks[it])} stats)")
