"""pkg/diagnostics manager: data.diagnostics parsing, snapshot +
time-average streams, MDS output readable by MITgcmutils-style rdmds,
and DIAG_STATIS ASCII statistics (diagnostics_readparms.F /
diagnostics_out.F / diagstats_output.F)."""

import os

import numpy as np
import pytest

from tests.conftest import reference_exp
from mitgcm_tpu.io import mds
from mitgcm_tpu.model import diagnostics as diag_mod
from mitgcm_tpu.model.experiment import Experiment, read_pickup


def test_parse_cs32x15_deck():
    """The reference's global_ocean.cs32x15 data.diagnostics parses into
    the expected 4 output streams + 1 statistics stream."""
    path = reference_exp("global_ocean.cs32x15") + "/input/data.diagnostics"

    class _FakeExp:
        cfg = None
        grid = None
        state = None
        forcing = None

    d = diag_mod.Diagnostics.from_file(_FakeExp(), path, out_dir="/tmp")
    names = {s.fname for s in d.streams}
    assert "oceDiag" in names
    s3 = [s for s in d.streams if s.fname == "oceDiag"][0]
    assert s3.freq == 864000.0
    assert "RHOAnoma" in s3.fields and "DRHODR" in s3.fields
    dyn = [s for s in d.streams if "UVEL" in s.fields][0]
    assert dyn.freq == 1728000.0 and "WVELSQ" in dyn.fields
    assert len(d.stats) == 1
    assert d.stats[0].fname == "dynStDiag"
    assert d.stats[0].freq == -864000.0
    assert "THETA" in d.stats[0].fields


def test_streams_write_and_read(tmp_path):
    """Run lab_sea 9 steps with its own data.diagnostics: the diagsSI
    time-average and diagsEXF snapshot streams fire at t=36000 and the
    files round-trip through rdmds with the right record count."""
    DIR = reference_exp("lab_sea")
    exp = Experiment.from_dir(DIR + "/input", nx=20, ny=16, nr=23)
    read_pickup(exp, DIR + "/input", 1)
    exp.enable_diagnostics(out_dir=str(tmp_path))
    exp.run(n_steps=9, collect_monitor=False)
    si = str(tmp_path / "diagsSI")
    assert os.path.exists(si + ".0000000010.data")
    arr, meta = mds.rdmds(si, itr=10, return_meta=True)
    assert meta["fldList"] == ["SIarea", "SIheff", "SIhsnow",
                               "SIuice", "SIvice"]
    a = np.asarray(arr)
    assert a.shape[0] == 5 and a.shape[-2:] == (16, 20)
    # time-mean ice area stays in [0, 1] and is nonzero
    area = a[0]
    assert 0.0 <= area.min() and area.max() <= 1.0 + 1e-6
    assert area.max() > 0.5


def test_stats_stream(tmp_path):
    """DIAG_STATIS stream writes a per-level ASCII stats file whose
    surface THETA mean equals the volume-weighted monitor value."""
    DIR = reference_exp("lab_sea")
    exp = Experiment.from_dir(DIR + "/input", nx=20, ny=16, nr=23)
    read_pickup(exp, DIR + "/input", 1)
    nml_path = tmp_path / "data.diagnostics"
    nml_path.write_text(
        " &DIAGNOSTICS_LIST\n &\n"
        " &DIAG_STATIS_PARMS\n"
        " stat_fields(1:2,1) = 'THETA   ','ETAN    ',\n"
        "  stat_fName(1) = 'dynStDiag',\n"
        "   stat_freq(1) = -3600.,\n"
        " &\n")
    exp.enable_diagnostics(out_dir=str(tmp_path), path=str(nml_path))
    exp.run(n_steps=1, collect_monitor=False)
    out = tmp_path / "dynStDiag.0000000002.txt"
    assert out.exists()
    txt = out.read_text()
    assert "field : THETA" in txt and "field : ETAN" in txt
    # 23 theta levels + 1 etan level of stats lines
    assert sum(1 for ln in txt.splitlines() if ln.startswith(" k=")) >= 17
