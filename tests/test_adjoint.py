"""AD slice test: adjoint gradient vs finite differences (grdchk).

The reference validates its TAF/Tapenade adjoints exactly this way
(pkg/grdchk, testreport -adm: `ADM adjoint_gradient` vs
`ADM finite-diff_grad`, agreement ~1e-6 with eps=1e-4). Here jax.grad
of the checkpointed timestep loop plays the role of ADTHE_MAIN_LOOP.
"""

import jax.numpy as jnp
import pytest

from mitgcm_tpu.ad import adjoint, grdchk
from mitgcm_tpu.utils import synthetic


@pytest.fixture(scope="module")
def setup():
    cfg = synthetic.gyre_config(nx=16, ny=16, nr=4, n_steps=6)
    grid, state, forcing, op = synthetic.gyre_setup(cfg, dtype=jnp.float64)
    control = adjoint.Control(cfg, grid, field="theta")
    cost = adjoint.cost_boxmean_tracer(
        cfg, grid, "theta", box=(8, 12, 8, 12), k_range=(0, 2))
    J = adjoint.make_objective(cfg, grid, op, forcing, state, control,
                               cost, n_steps=6)
    return cfg, grid, control, J


def test_grdchk_agreement(setup):
    cfg, grid, control, J = setup
    xx0 = control.zero()
    positions = [(1, cfg.oly + 9, cfg.olx + 9),
                 (0, cfg.oly + 10, cfg.olx + 8),
                 (2, cfg.oly + 6, cfg.olx + 11)]
    res = grdchk.grdchk(J, xx0, positions, eps=1.0e-4)
    for r in res:
        assert r["adj_grad"] != 0.0, r
        assert abs(r["rel_err"]) < 1.0e-5, r


def test_gradient_nonlocal(setup):
    """Sensitivity propagates upstream of the cost box (advective adjoint
    transport through the halo-exchanged stencils)."""
    cfg, grid, control, J = setup
    import jax
    grad = jax.grad(J)(control.zero())
    interior = grad[:, cfg.oly:-cfg.oly, cfg.olx:-cfg.olx]
    assert float(jnp.sum(jnp.abs(interior) > 0)) > 100
