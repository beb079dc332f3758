#!/usr/bin/env python
"""Benchmark: barotropic-gyre-style core step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's committed single-CPU timer reports give
~2.2e4-8.5e4 grid-points*steps/s on its tutorial configs (BASELINE.md).
We report grid-points*steps/s of the jit-compiled forward step on the
tutorial_barotropic_gyre deck (62x62x1, same numerics, f32 on TPU).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import jax.numpy as jnp


def main():
    from mitgcm_tpu.model.experiment import Experiment

    exp_dir = "/root/reference/verification/tutorial_barotropic_gyre/input"
    dtype = jnp.float32
    exp = Experiment.from_dir(exp_dir, dtype=dtype)

    n_steps = 200
    # warm-up/compile
    final_state, diags = exp.run_scan(n_steps=2)
    jax.block_until_ready(final_state.etaN)

    t0 = time.perf_counter()
    final_state, diags = exp.run_scan(n_steps=n_steps)
    jax.block_until_ready(final_state.etaN)
    dt = time.perf_counter() - t0

    pts = exp.cfg.nx * exp.cfg.ny * exp.cfg.nr
    rate = pts * n_steps / dt
    baseline = 2.2e4  # ref tutorial_barotropic_gyre points*steps/s (BASELINE.md)
    print(json.dumps({
        "metric": "barotropic_gyre_points_steps_per_s",
        "value": round(rate, 1),
        "unit": "gridpoints*steps/s",
        "vs_baseline": round(rate / baseline, 2),
    }))


if __name__ == "__main__":
    main()
