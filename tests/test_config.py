"""YAML config source/sink (SURVEY S6/S7): path absolutize/relativize
round-trip, reference semantics (DistilBERT-CRF/src/config.py:11-86)."""

from pathlib import Path

import pytest

from ner_extractor_spark.config import load_config, save_config


def test_load_absolutizes_paths(tmp_path):
    (tmp_path / "data").mkdir()
    cfg_file = tmp_path / "conf.yaml"
    cfg_file.write_text(
        "paths:\n  raw: data/raw\n  cache:\n"
        "model:\n  lr: 2.0e-05\nlang: en\n")
    cfg = load_config(cfg_file)
    assert cfg["paths"]["raw"] == (tmp_path / "data" / "raw").resolve()
    assert cfg["paths"]["cache"] is None            # None passes through
    assert cfg["model"]["lr"] == 2e-5               # non-path sections intact
    assert cfg["lang"] == "en"


def test_save_relativizes_inside_tree_keeps_absolute_outside(tmp_path):
    out = tmp_path / "run" / "conf.yaml"
    cfg = {"paths": {"inside": tmp_path / "run" / "data",
                     "outside": Path("/somewhere/else"),
                     "plain": "untouched-string"},
           "run_id": "r1"}
    save_config(cfg, out)
    text = out.read_text()
    assert "inside: data" in text                   # relative to out dir
    assert "/somewhere/else" in text                # absolute fallback
    assert "untouched-string" in text


def test_round_trip_same_directory(tmp_path):
    (tmp_path / "data").mkdir()
    src = tmp_path / "a.yaml"
    src.write_text("paths:\n  raw: data\nlang: de\n")
    first = load_config(src)
    save_config(first, tmp_path / "b.yaml")
    second = load_config(tmp_path / "b.yaml")
    assert second["paths"] == first["paths"]
    assert second["lang"] == "de"


def test_load_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_config(tmp_path / "missing.yaml")
    bad = tmp_path / "bad.yaml"
    bad.write_text("- just\n- a list\n")
    with pytest.raises(ValueError):
        load_config(bad)
