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


def _args(**kw):
    import argparse
    d = {"pages": None, "synth": None, "workdir": None,
         "lang": None, "run_id": None}
    d.update(kw)
    return argparse.Namespace(**d)


def test_resolve_run_args_precedence_and_null_keys():
    from ner_extractor_spark.cli import resolve_run_args

    # flags always win over config
    r = resolve_run_args(_args(synth=7, lang="de", run_id="rX", workdir="w"),
                         {"synth": 99, "lang": "fr", "run_id": "rY",
                          "paths": {"workdir": "other"}})
    assert (r["synth"], r["lang"], r["run_id"], r["workdir"]) == \
        (7, "de", "rX", "w")

    # absent keys -> documented defaults
    r = resolve_run_args(_args(), {})
    assert (r["synth"], r["lang"], r["run_id"]) == (0, "en", "run0")

    # present-but-null / empty keys behave like absent ones...
    r = resolve_run_args(_args(), {"synth": None, "run_id": ""})
    assert (r["synth"], r["run_id"]) == (0, "run0")
    # ...EXCEPT lang, where explicit null means "all languages"
    r = resolve_run_args(_args(), {"lang": None})
    assert r["lang"] == "all"
    # numeric-ish values survive coercion instead of truthiness traps
    r = resolve_run_args(_args(), {"run_id": 0, "synth": "12"})
    assert (r["run_id"], r["synth"]) == ("0", 12)

    # paths section supplies pages/workdir when flags are absent
    r = resolve_run_args(_args(), {"paths": {"pages": "/p", "workdir": "/w"}})
    assert (r["pages"], r["workdir"]) == ("/p", "/w")
