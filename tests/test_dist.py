"""Decomposition invariance: 1 device vs 2x4 mesh must agree.

The reference's distributed test is exactly this (SURVEY 4: the same
digit-matching reference is used for 1-proc and N-proc runs). ppermute
halo exchange + psum reductions must reproduce the single-device cyclic
fill bit-for-bit up to reduction ordering.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mitgcm_tpu.model import step as step_mod
from mitgcm_tpu.parallel import dist
from mitgcm_tpu.utils import synthetic


@pytest.fixture(scope="module")
def setup():
    cfg = synthetic.gyre_config(nx=16, ny=16, nr=3, n_steps=4)
    grid, state, forcing, op = synthetic.gyre_setup(cfg, dtype=jnp.float64)
    return cfg, grid, state, forcing, op


def test_single_vs_mesh(setup):
    cfg, grid, state, forcing, op = setup
    n_steps = 4

    # single device reference
    step1 = jax.jit(lambda s, f, it: step_mod.forward_step(
        cfg, grid, op, s, f, it))
    s1 = state
    for i in range(n_steps):
        s1, diag1 = step1(s1, forcing, jnp.asarray(i))

    cpus = jax.devices("cpu")
    assert len(cpus) >= 8
    mesh = Mesh(np.array(cpus[:8]).reshape(2, 4), ("py", "px"))
    model = dist.DistModel(cfg, grid, op, mesh)
    sb = model.shard(state)
    fb = model.shard(forcing)
    sb, diags = model.run(sb, fb, n_steps=n_steps)

    eta_1 = np.asarray(s1.etaN)[cfg.oly:-cfg.oly, cfg.olx:-cfg.olx]
    eta_n = dist.untile(np.asarray(jax.device_get(sb.etaN)),
                        cfg.oly, cfg.olx)
    u_1 = np.asarray(s1.uVel)[:, cfg.oly:-cfg.oly, cfg.olx:-cfg.olx]
    u_n = dist.untile(np.asarray(jax.device_get(sb.uVel)),
                      cfg.oly, cfg.olx)
    assert np.allclose(eta_1, eta_n, rtol=0, atol=3e-11 * max(
        1.0, float(np.max(np.abs(eta_1)))))
    assert np.allclose(u_1, u_n, rtol=0, atol=3e-11 * max(
        1.0, float(np.max(np.abs(u_1)))))
    # cg2d residual diagnostic agrees too
    r1 = float(diag1.cg2d_init_res)
    rn = float(diags[-1].cg2d_init_res)
    assert abs(r1 - rn) <= 1e-9 * max(1.0, abs(r1))
