"""Estimation stack vs the committed Tapenade references.

verification/tutorial_baroclinic_gyre/{input_tap,code_tap} define the
reference's AD validation setup: two genarr3d controls (xx_theta,
xx_salt — data.ctrl CTRL_NML_GENARR), the ALLOW_COST_TSQUARED cost_test
objective (sum of theta(k=1)^2 at the final state, pkg/cost/cost_test.F
+ cost_final.F:147), a 10-step run (deltaT=1200, endTime=12000), and a
pkg/grdchk finite-difference check at global points (4..8, 8, 1) with
eps=1e-5.

results/output_tap_adj.txt holds the Tapenade ADJOINT gradients and
results/output_tap_tlm.txt the TANGENT-LINEAR ones; jax.grad reproduces
the adjoint values to all 12 printed digits and the scalar TLM
directional derivative (= <grad, dxx>) matches output_tap_tlm to >= 9.

Also exercised: the ctrl_pack.F packed-vector file format round-trip
(Fortran sequential records, wet-point compression)."""

import numpy as np
import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.ad import estim
from mitgcm_tpu.utils import refout

DIR = reference_exp("tutorial_baroclinic_gyre") + "/input_tap"

FC_REF = 3.22503044491076e6                      # output_tap_adj.txt:2898
# grad-res rows: (i, adj grad, tlm grad, fd grad)
ROWS = [
    (4, 5.96880260013e1, 5.96880260001e1, 5.96880447119e1),
    (5, 5.96882747702e1, 5.96882747687e1, 5.96882775426e1),
    (6, 5.96885242941e1, 5.96885242928e1, 5.96885103732e1),
    (7, 5.96887743665e1, 5.96887743652e1, 5.96887897700e1),
]


@pytest.fixture(scope="module")
def prob():
    exp = Experiment.from_dir(DIR, strict_config=False)
    cfg = exp.cfg
    assert cfg.deltaTClock == 1200.0
    p = estim.CtrlProblem(exp, n_steps=10)
    assert [c.name for c in p.ctrls] == ["xx_theta", "xx_salt"]
    assert p.ctrls[0].kind == "genarr3d"
    assert p.ctrls[0].bounds == [-2.0, -1.9, 39.0, 40.0, 5.0]
    return p


@pytest.fixture(scope="module")
def grad(prob):
    return prob.gradient()


def test_cost_matches_tapenade(grad):
    fc, _ = grad
    assert refout.matching_digits(float(fc), FC_REF) >= 12


def test_adjoint_gradient_matches_tapenade(prob, grad):
    _, g = grad
    cfg = prob.cfg
    for i, adj_ref, _, _ in ROWS:
        mine = float(g["xx_theta"][0, cfg.oly + 8 - 1, cfg.olx + i - 1])
        assert refout.matching_digits(mine, adj_ref) >= 11, (i, mine)


def test_salt_gradient_zero(grad):
    # sBeta=0 and saltStepping=.FALSE. in this deck: salt cannot affect
    # the theta-only cost, so its adjoint sensitivity is exactly zero
    _, g = grad
    assert float(np.abs(np.asarray(g["xx_salt"])).max()) == 0.0


def test_tlm_matches_tapenade(prob, grad):
    cfg = prob.cfg
    for i, _, tlm_ref, _ in ROWS[:2]:
        d = prob.xx0()
        d["xx_theta"] = d["xx_theta"].at[
            0, cfg.oly + 8 - 1, cfg.olx + i - 1].set(1.0)
        _, dot = prob.tangent(d)
        assert refout.matching_digits(dot, tlm_ref) >= 9, (i, dot)


def test_grdchk_fd_consistency(prob):
    # pkg/grdchk analog: central FD at eps=1e-5 agrees with the adjoint
    # to the solver-tolerance noise floor (the reference's own fd-vs-adj
    # mismatch is ~3e-7 relative, output_tap_adj.txt grad-res rows)
    rows = prob.grdchk(params={"grdchk_eps": 1e-5, "iglopos": 4,
                               "jglopos": 8, "kglopos": 1,
                               "nstep": 1, "nend": 2,
                               "grdchkvarname": "xx_theta"})
    for r in rows:
        assert abs(r["fd"] / r["grad"] - 1.0) < 1e-4, r
        assert refout.matching_digits(r["fcref"], FC_REF) >= 12


def test_ctrl_pack_roundtrip(prob, grad, tmp_path):
    _, g = grad
    cfg, grid = prob.cfg, prob.grid
    path = str(tmp_path / "adxx_vector_MIT_CE_000.opt0000")
    xx = {k: np.asarray(v) for k, v in g.items()}
    n = estim.pack_ctrl_file(path, cfg, grid, prob.ctrls, xx,
                             fc=FC_REF, prec32=False)
    nwet = int((np.asarray(grid.maskC)[
        :, cfg.oly:-cfg.oly, cfg.olx:-cfg.olx] > 0).sum())
    assert n == 2 * nwet
    hdr, back = estim.unpack_ctrl_file(path, cfg, grid, prob.ctrls,
                                       prec32=False)
    assert hdr["fc"] == FC_REF and hdr["nvarlength"] == n
    for k in xx:
        m = np.asarray(grid.maskC) > 0
        assert np.array_equal(np.asarray(back[k])[m], xx[k][m])
