#!/usr/bin/env python
"""Benchmark: forward-step throughput + roofline on the local accelerator.

Prints ONE JSON line.  Headline metric stays the barotropic-gyre
points*steps/s (comparable across rounds, vs the reference's committed
single-CPU timer baseline ~2.2e4 from BASELINE.md); extra keys report:
  - configs: points*steps/s for 3 configs, including a large
    bandwidth-bound domain (1024x1024x32 stratified gyre, f32)
  - hbm_gbps: STREAM-triad-style measured HBM bandwidth on this chip
  - model_gbps / roofline_frac: estimated bytes moved by the large-domain
    step (3-D field traffic) vs the measured bandwidth

Everything runs through run_scan (the whole n-step loop is ONE compiled
XLA program; monitor stays off the hot path).
"""

import json
import os
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import jax.numpy as jnp


def _time_scan(exp, n_steps, warmup=2):
    final_state, _ = exp.run_scan(n_steps=warmup)
    jax.block_until_ready(final_state.etaN)
    t0 = time.perf_counter()
    final_state, _ = exp.run_scan(n_steps=n_steps)
    jax.block_until_ready(final_state.etaN)
    return time.perf_counter() - t0


def bench_deck(exp_dir, n_steps, dtype, **size_kw):
    from mitgcm_tpu.model.experiment import Experiment
    exp = Experiment.from_dir(exp_dir, dtype=dtype, **size_kw)
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
    # bytes moved per step from XLA's own cost model of one forward step
    import jax as _jax
    from mitgcm_tpu.model import step as step_mod

    def one(state_a, grid_a, op_a, forcing_a):
        ns, _ = step_mod.forward_step(cfg, grid_a, op_a, state_a,
                                      forcing_a, 0)
        return ns

    try:
        comp = _jax.jit(one).lower(exp.state, exp.grid, exp.op,
                                   exp.forcing).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        bytes_per_step = float(ca.get("bytes accessed", 0.0))
    except Exception:
        bytes_per_step = 0.0
    model_gbps = bytes_per_step * (rate / pts) / 1e9
    return rate, dt, model_gbps


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


def main():
    results = {}
    gyre_dir = "/root/reference/verification/tutorial_barotropic_gyre/input"
    rate_g, _ = bench_deck(gyre_dir, 200, jnp.float32)
    results["barotropic_gyre_62x62x1_f32"] = round(rate_g, 1)

    latlon = "/root/reference/verification/tutorial_global_oce_latlon/input"
    try:
        rate_l, _ = bench_deck(latlon, 60, jnp.float32, nx=90, ny=40, nr=15)
        results["global_oce_latlon_90x40x15_f32"] = round(rate_l, 1)
    except Exception as e:          # pragma: no cover - report, keep going
        results["global_oce_latlon_90x40x15_f32"] = f"failed: {e}"

    rate_big, _, model_gbps = bench_large()
    results["gyre_1024x1024x32_f32"] = round(rate_big, 1)

    hbm = measure_hbm_gbps()

    baseline = 2.2e4   # reference tutorial_barotropic_gyre (BASELINE.md)
    print(json.dumps({
        "metric": "barotropic_gyre_points_steps_per_s",
        "value": round(rate_g, 1),
        "unit": "gridpoints*steps/s",
        "vs_baseline": round(rate_g / baseline, 2),
        "configs": results,
        "hbm_gbps_measured": round(hbm, 1),
        "large_model_gbps_est": round(model_gbps, 1),
        "roofline_frac_est": round(model_gbps / hbm, 3),
    }))


if __name__ == "__main__":
    main()
