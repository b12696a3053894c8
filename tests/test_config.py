"""Parameter-file parsing: grammar compatibility with nbody/parameter.txt."""

import math
import os

import pytest

from sidm_tpu.config import (ParameterError, SimConfig, parse_parameter_file,
                             set_units, write_parameters_out)

REF_PARAM = "/root/reference/nbody/parameter.txt"


def test_parse_reference_parameter_file():
    cfg = parse_parameter_file(REF_PARAM)
    assert cfg.InitCondFile == "eddington_nfw_far_80_in"
    assert cfg.CrossSection == pytest.approx(38.2614)
    assert cfg.RandomSeed1 == 55 and cfg.RandomSeed2 == 497527
    assert cfg.ProbabilityTol == pytest.approx(0.2)
    assert cfg.ReflectionBoundary == pytest.approx(1114.35)
    assert cfg.TimeMax == pytest.approx(500.0)
    assert cfg.ErrTolTheta == pytest.approx(0.5)
    assert cfg.TypeOfOpeningCriterion == 1
    assert cfg.TypeOfTimestepCriterion == 1
    assert cfg.DesNumNgb == 30 and cfg.MaxNumNgbDeviation == 2
    assert cfg.SofteningHalo == pytest.approx(0.3)
    assert cfg.UnitLength_in_cm == pytest.approx(3.085678e21)
    assert cfg.ComovingIntegrationOn == 0
    assert cfg.OutputDir == "./"


def test_units_match_reference_values():
    """parameter.txt:31 documents sigma_internal = 79.9272 for sigma=38.2614
    cm^2/g in the kpc/1e10Msun/km-s system; G should be ~43007.1 x 1e-10."""
    cfg = parse_parameter_file(REF_PARAM)
    u = set_units(cfg)
    assert u.CrossSectionInternal == pytest.approx(79.9272, rel=1e-4)
    # G in (kpc, 1e10 Msun, km/s): 43007.1 in Gadget-2 units x 1e-10 scaling
    assert u.G == pytest.approx(43007.1, rel=1e-3)
    # Hubble: 0.1 in these units
    assert u.Hubble == pytest.approx(0.1, rel=1e-3)


def test_unknown_tag_rejected(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("NotATag  1.0\n")
    with pytest.raises(ParameterError):
        parse_parameter_file(str(p), strict=False)


def test_duplicate_tag_rejected(tmp_path):
    p = tmp_path / "dup.txt"
    p.write_text("TimeMax 1.0\nTimeMax 2.0\n")
    with pytest.raises(ParameterError):
        parse_parameter_file(str(p), strict=False)


def test_missing_required_tag_rejected(tmp_path):
    p = tmp_path / "missing.txt"
    p.write_text("TimeMax 1.0\n")
    with pytest.raises(ParameterError):
        parse_parameter_file(str(p), strict=True)


def test_parameters_out_echo(tmp_path):
    cfg = SimConfig(OutputDir=str(tmp_path))
    out = write_parameters_out(cfg)
    text = open(out).read()
    assert "TimeMax" in text and "CrossSection" in text


def test_comment_styles(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("% full comment line\nTimeMax 5.0 ; trailing\n"
                 "TimeBegin 1.0 % trailing too\n")
    cfg = parse_parameter_file(str(p), strict=False)
    assert cfg.TimeMax == 5.0 and cfg.TimeBegin == 1.0
