"""Offline optimization loop (optim/lsopt replacement) on the
tutorial_baroclinic_gyre tap setup: minimize the cost_test objective
(sum theta(k=1)^2 at the final state) over the xx_theta initial-state
control. The L-BFGS driver (ad/optim.py, lsopt_top.F analog) must make
steady progress; the bound projection mirrors pkg/ctrl/ctrl_bound.F."""

import numpy as np

from tests.conftest import reference_exp
from mitgcm_tpu.model.experiment import Experiment
from mitgcm_tpu.ad import estim, optim

DIR = reference_exp("tutorial_baroclinic_gyre") + "/input_tap"


def test_lbfgs_reduces_cost(tmp_path):
    exp = Experiment.from_dir(DIR, strict_config=False)
    prob = estim.CtrlProblem(exp, n_steps=5)
    xx, hist = optim.optimize(prob, max_cycles=3, out_dir=str(tmp_path))
    fcs = [h[0] for h in hist]
    assert len(fcs) >= 3
    assert fcs[-1] < 0.8 * fcs[0], fcs
    # monotone decrease (Armijo-accepted steps only)
    assert all(b <= a for a, b in zip(fcs, fcs[1:])), fcs
    # packed cycle files exist and round-trip
    files = sorted(tmp_path.glob("ecco_ctrl_*"))
    assert files
    hdr, back = estim.unpack_ctrl_file(str(files[-1]), prob.cfg, prob.grid,
                                       prob.ctrls)
    assert hdr["optimcycle"] >= 1
    # final control moved theta towards colder surface values
    assert float(np.asarray(xx["xx_theta"]).min()) < 0.0
