"""YAML config source/sink (SURVEY S6/S7; reference semantics
``DistilBERT-CRF/src/config.py:11-50`` load, ``:53-86`` save).

Contract reproduced, not code: a config is a top-level YAML mapping whose
``paths`` section is *portable* — stored relative to the config file,
materialized absolute on load:

  * ``load_config`` absolutizes every ``paths`` entry against the config
    file's parent directory (None entries stay None); rejects missing
    files and non-mapping documents.
  * ``save_config`` relativizes ``Path`` values under ``paths`` against
    the destination directory when possible (values outside that tree
    stay absolute — same fallback as the reference) and writes YAML with
    insertion order preserved.

Round-trip invariant (pinned in tests/test_config.py):
``load_config(save_config(load_config(p), q))`` yields the same absolute
paths whenever q lives in the same directory as p.

The gated import keeps the module importable on clusters without PyYAML
(executors never need it — config handling is driver-side only).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Mapping, Union


def _yaml():
    try:
        import yaml
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "YAML config support needs PyYAML on the driver") from e
    return yaml


def load_config(config_path: Union[str, Path]) -> Dict[str, Any]:
    """Read a YAML config; absolutize the ``paths`` section (S6)."""
    yaml = _yaml()
    src = Path(config_path).expanduser().resolve()
    if not src.exists():
        raise FileNotFoundError(f"Config file not found: {src}")

    data = yaml.safe_load(src.read_text(encoding="utf-8"))
    if not isinstance(data, dict):
        raise ValueError(f"Config must be a top-level mapping: {src}")

    paths = data.get("paths")
    if isinstance(paths, Mapping):
        data["paths"] = {
            k: None if v is None
            else (src.parent / str(v)).expanduser().resolve()
            for k, v in paths.items()
        }
    return data


def save_config(config: Mapping[str, Any],
                output_path: Union[str, Path]) -> Path:
    """Write a config as YAML; relativize ``paths`` entries (S7)."""
    yaml = _yaml()
    dst = Path(output_path).expanduser().resolve()
    dst.parent.mkdir(parents=True, exist_ok=True)

    out: Dict[str, Any] = dict(config)
    paths = out.get("paths")
    if isinstance(paths, Mapping):
        rel = {}
        for k, v in paths.items():
            if isinstance(v, Path):
                try:
                    rel[k] = str(v.relative_to(dst.parent))
                except ValueError:
                    rel[k] = str(v)   # outside the tree: keep absolute
            else:
                rel[k] = v
        out["paths"] = rel

    dst.write_text(
        yaml.safe_dump(out, sort_keys=False, allow_unicode=False),
        encoding="utf-8")
    return dst
