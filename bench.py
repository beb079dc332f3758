#!/usr/bin/env python
"""Benchmark: forward-step throughput + roofline on the local accelerator.

Prints ONE JSON line.  Headline metric stays the barotropic-gyre
points*steps/s in f32 (comparable across rounds, vs the reference's
committed single-CPU timer baseline ~2.2e4 from BASELINE.md); extra keys:
  - configs: points*steps/s for the driver-designated decks in BOTH f32
    and f64 (all correctness testing is f64), plus a large
    bandwidth-bound domain (1024x1024x32 stratified gyre, f32)
  - hbm_gbps_measured: STREAM-triad measured HBM bandwidth on this chip
  - large_model_gbps_*: bytes moved per second by the large-domain step,
    from (a) XLA's cost model and (b) a field-traffic lower bound
    (prognostic + scratch 3-D field reads/writes actually in the step)
  - roofline_frac_est: cost-model traffic / measured bandwidth

Everything runs through run_scan (the whole n-step loop is ONE compiled
XLA program; monitor stays off the hot path).
"""

import json
import os
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")   # f64 rows need x64

import jax
import jax.numpy as jnp

VERIF = "/root/reference/verification"


def _time_scan(exp, n_steps, warmup=2):
    final_state, _ = exp.run_scan(n_steps=warmup)
    jax.block_until_ready(final_state.etaN)
    t0 = time.perf_counter()
    final_state, _ = exp.run_scan(n_steps=n_steps)
    jax.block_until_ready(final_state.etaN)
    return time.perf_counter() - t0


def bench_deck(exp_dir, n_steps, dtype, pickup=None, **size_kw):
    from mitgcm_tpu.model.experiment import Experiment, read_pickup
    exp = Experiment.from_dir(exp_dir, dtype=dtype, **size_kw)
    if pickup is not None:
        read_pickup(exp, exp_dir, pickup)
    dt = _time_scan(exp, n_steps)
    pts = exp.cfg.nx * exp.cfg.ny * exp.cfg.nr
    return pts * n_steps / dt, dt


def bench_large(nx=1024, ny=1024, nr=32, n_steps=20):
    """Large stratified gyre: HBM-bandwidth-bound on a single chip."""
    from mitgcm_tpu.model.experiment import Experiment
    from mitgcm_tpu.utils import synthetic

    cfg = synthetic.gyre_config(nx=nx, ny=ny, nr=nr, deltaT=600.0)
    grid, state, forcing, op = synthetic.gyre_setup(cfg, dtype=jnp.float32)
    exp = Experiment(cfg=cfg, grid=grid, state=state, forcing=forcing,
                     op=op)
    dt = _time_scan(exp, n_steps, warmup=2)
    pts = nx * ny * nr
    rate = pts * n_steps / dt

    from mitgcm_tpu.model import step as step_mod

    def one(state_a, grid_a, op_a, forcing_a):
        ns, _ = step_mod.forward_step(cfg, grid_a, op_a, state_a,
                                      forcing_a, 0)
        return ns

    # (a) XLA's own cost model of one compiled forward step
    try:
        comp = jax.jit(one).lower(exp.state, exp.grid, exp.op,
                                  exp.forcing).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        bytes_cost_model = float(ca.get("bytes accessed", 0.0))
    except Exception:
        bytes_cost_model = 0.0
    # (b) field-traffic lower bound: every 3-D prognostic read+written
    # once (u,v,w,t,s + AB histories u,v,t,s = 9 fields r+w) plus ~8
    # scratch 3-D passes (fluxes, phiHyd, cg2d ~10 iters on 2-D is small)
    fld_bytes = 4 * pts
    bytes_lower_bound = fld_bytes * (2 * 9 + 8)
    step_per_s = rate / pts
    return (rate, dt, bytes_cost_model * step_per_s / 1e9,
            bytes_lower_bound * step_per_s / 1e9)


def measure_hbm_gbps():
    """STREAM-triad on 256 MiB operands: a = b*s + c."""
    n = 64 * 1024 * 1024
    b = jnp.arange(n, dtype=jnp.float32)
    c = jnp.ones((n,), jnp.float32)

    @jax.jit
    def triad(b, c):
        return b * 1.5 + c

    a = triad(b, c)
    jax.block_until_ready(a)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        a = triad(b, c)
    jax.block_until_ready(a)
    dt = time.perf_counter() - t0
    # 2 reads + 1 write x 4 bytes
    return reps * 3 * 4 * n / dt / 1e9


DECKS = [
    # name, deck dir, n_steps, pickup iter, size kwargs
    ("barotropic_gyre_62x62x1",
     f"{VERIF}/tutorial_barotropic_gyre/input", 200, None, {}),
    ("baroclinic_gyre_62x62x15",
     f"{VERIF}/tutorial_baroclinic_gyre/input", 100, None,
     dict(nx=62, ny=62, nr=15)),
    ("global_oce_latlon_90x40x15",
     f"{VERIF}/tutorial_global_oce_latlon/input", 60, None,
     dict(nx=90, ny=40, nr=15)),
    ("lab_sea_20x16x23",
     f"{VERIF}/lab_sea/input", 60, 1, dict(nx=20, ny=16, nr=23)),
]


def main():
    results = {}
    rate_g = None
    for name, deck, nsteps, pickup, kw in DECKS:
        for dtype, tag in ((jnp.float32, "f32"), (jnp.float64, "f64")):
            try:
                rate, _ = bench_deck(deck, nsteps, dtype, pickup=pickup,
                                     **kw)
                results[f"{name}_{tag}"] = round(rate, 1)
            except Exception as e:    # pragma: no cover - report, go on
                results[f"{name}_{tag}"] = f"failed: {type(e).__name__}"
                rate = None
            if name.startswith("barotropic") and tag == "f32":
                rate_g = rate

    rate_big, _, gbps_cost, gbps_lb = bench_large()
    results["gyre_1024x1024x32_f32"] = round(rate_big, 1)

    hbm = measure_hbm_gbps()

    baseline = 2.2e4   # reference tutorial_barotropic_gyre (BASELINE.md)
    print(json.dumps({
        "metric": "barotropic_gyre_points_steps_per_s",
        "value": round(rate_g, 1) if rate_g else None,
        "unit": "gridpoints*steps/s",
        "vs_baseline": round(rate_g / baseline, 2) if rate_g else None,
        "configs": results,
        "hbm_gbps_measured": round(hbm, 1),
        "large_model_gbps_est": round(gbps_cost, 1),
        "large_model_gbps_lower_bound": round(gbps_lb, 1),
        "roofline_frac_est": round(gbps_cost / hbm, 3),
    }))


if __name__ == "__main__":
    main()
