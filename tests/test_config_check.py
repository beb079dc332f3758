"""Fail-loudly config_check (model/src/config_check.F analog), per-phase
timers and the NaN-trap debug mode."""

import shutil

import jax.numpy as jnp
import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.core import config as config_mod
from mitgcm_tpu.core.state import State
from mitgcm_tpu.model.experiment import Experiment

GYRE = reference_exp("tutorial_barotropic_gyre") + "/input"


def _deck_with_extra_key(tmp_path, line):
    run = tmp_path / "input"
    shutil.copytree(GYRE, run)
    data = (run / "data").read_text()
    data = data.replace(" viscAh=4.E2,", " viscAh=4.E2,\n" + line)
    (run / "data").write_text(data)
    return str(run)


def test_unknown_key_raises(tmp_path):
    run = _deck_with_extra_key(tmp_path, " viscAhLeithQG=1.E2,")
    with pytest.raises(config_mod.ConfigCheckError) as ei:
        Experiment.from_dir(run)
    assert "viscahleithqg" in str(ei.value).lower()


def test_strict_false_escape(tmp_path):
    run = _deck_with_extra_key(tmp_path, " viscAhLeithQG=1.E2,")
    e = Experiment.from_dir(run, strict_config=False)
    assert any(k.lower() == "viscahleithqg" for k in e.cfg.extra)


def test_ignorable_io_keys_pass(tmp_path):
    run = _deck_with_extra_key(tmp_path, " useSingleCpuIO=.TRUE.,")
    Experiment.from_dir(run)   # must not raise


def test_timers_and_nan_trap():
    e = Experiment.from_dir(GYRE)
    e.run(n_steps=2, collect_monitor=False)
    rep = e.timing_report()
    assert "forward_step" in rep and "total" in rep
    # poison the state: the trap must name the field and iteration
    e.nan_trap = True
    e.state = State(**{**e.state.__dict__,
                       "etaN": e.state.etaN.at[10, 10].set(jnp.nan)})
    with pytest.raises(FloatingPointError) as ei:
        e.run(n_steps=1, collect_monitor=False)
    assert "etaN" in str(ei.value)
