"""Typed, immutable configuration system.

Capability parity with the reference's global-dict hparams loader
(`/root/reference/utils/commons/hparams.py:17-131`): layered YAML configs with
recursive multi-parent ``base_config`` inheritance (depth-first, first-visit-wins
cycle guard), dotted CLI overrides (``--hparams "a=1,b.c=2"``), and per-experiment
config persistence.

Intentional design delta (SURVEY.md §7): instead of one global *mutable* dict
imported everywhere, configs here are a frozen mapping (`HParams`) passed
explicitly; model code derives small typed dataclass configs from it
(e.g. ``models.vocoder.HifiGanConfig.from_hparams``) so jitted functions close
over hashable static configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import re
from types import MappingProxyType
from typing import Any, Iterator, Mapping

import yaml


class HParams(Mapping[str, Any]):
    """Immutable nested mapping with attribute access.

    Nested dicts are wrapped lazily; lists are converted to tuples so the whole
    object is hashable and safe to close over in jitted functions.
    """

    __slots__ = ("_d",)

    def __init__(self, d: Mapping[str, Any]):
        object.__setattr__(self, "_d", MappingProxyType(dict(d)))

    # Mapping interface
    def __getitem__(self, k: str) -> Any:
        v = self._d[k]
        if isinstance(v, dict):
            return HParams(v)
        if isinstance(v, list):
            return _freeze_list(v)
        return v

    def __iter__(self) -> Iterator[str]:
        return iter(self._d)

    def __len__(self) -> int:
        return len(self._d)

    def __contains__(self, k: object) -> bool:
        return k in self._d

    def __getattr__(self, k: str) -> Any:
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def get(self, k: str, default: Any = None) -> Any:
        return self[k] if k in self._d else default

    def __hash__(self) -> int:
        return hash(_freeze(dict(self._d)))

    def __eq__(self, other: object) -> bool:
        if isinstance(other, HParams):
            return dict(self._d) == dict(other._d)
        if isinstance(other, Mapping):
            return dict(self._d) == dict(other)
        return NotImplemented

    def __repr__(self) -> str:
        return f"HParams({dict(self._d)!r})"

    def to_dict(self) -> dict:
        """Deep-copy back to plain (mutable) nested dicts."""

        def conv(v):
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [conv(x) for x in v]
            return v

        return conv(dict(self._d))

    def replace(self, **updates: Any) -> "HParams":
        d = self.to_dict()
        for k, v in updates.items():
            _set_dotted(d, k, v)
        return HParams(d)


def _freeze(v: Any) -> Any:
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


def _freeze_list(v: list) -> tuple:
    return tuple(HParams(x) if isinstance(x, dict) else (_freeze_list(x) if isinstance(x, list) else x) for x in v)


def _set_dotted(d: dict, key: str, value: Any) -> None:
    parts = key.split(".")
    for p in parts[:-1]:
        nxt = d.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            d[p] = nxt
        d = nxt
    d[parts[-1]] = value


def _parse_value(v: str) -> Any:
    """Parse a CLI override value string to a Python value.

    Mirrors the reference's typed dotted overrides incl. lists
    (`hparams.py:91-106`) but via yaml.safe_load instead of ``eval``.
    """
    v = v.strip()
    if v == "":
        return ""
    # YAML 1.1 won't parse "1e-4" as float; handle scientific notation first.
    if re.fullmatch(r"[-+]?(\d+\.?\d*|\.\d+)[eE][-+]?\d+", v):
        return float(v)
    try:
        return yaml.safe_load(v)
    except yaml.YAMLError:
        return v


def _deep_update(base: dict, new: dict) -> dict:
    """Recursively merge ``new`` into ``base`` (new wins), like the
    reference's ``override_config`` (`hparams.py:17-24`)."""
    for k, v in new.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def load_config(config_path: str, *, _seen: set[str] | None = None) -> dict:
    """Load a YAML config with recursive ``base_config`` inheritance.

    DFS over parents with a first-visit-wins cycle guard, matching the
    reference loader semantics (`hparams.py:51-72`): parents are merged in
    listed order (later parents override earlier ones), then the child
    overrides all parents.
    """
    _seen = _seen if _seen is not None else set()
    config_path = os.path.abspath(config_path)
    if config_path in _seen:
        return {}
    _seen.add(config_path)
    with open(config_path) as f:
        cfg = yaml.safe_load(f) or {}
    bases = cfg.pop("base_config", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: dict = {}
    for b in bases:
        if not os.path.isabs(b):
            # Paths are repo-root-relative (like the reference's egs/...) or
            # relative to the including file; try both.
            cand = os.path.join(os.path.dirname(config_path), b)
            b = cand if os.path.exists(cand) else os.path.join(_repo_root(), b)
        _deep_update(merged, load_config(b, _seen=_seen))
    _deep_update(merged, cfg)
    return merged


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_hparams_overrides(s: str) -> dict:
    """Parse ``"a=1,b.c=[2,3],d=x"`` into a nested dict of overrides.

    Commas inside brackets/braces are respected (reference: `hparams.py:91-106`).
    """
    out: dict = {}
    if not s:
        return out
    # split on commas not inside [] {} ()
    parts = re.split(r",(?![^\[\]{}()]*[\]}\)])", s)
    for part in parts:
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"bad hparams override (need k=v): {part!r}")
        k, v = part.split("=", 1)
        _set_dotted(out, k.strip(), _parse_value(v))
    return out


def set_hparams(
    config: str = "",
    exp_name: str = "",
    hparams_str: str = "",
    *,
    work_dir_root: str = "checkpoints",
    save: bool = True,
    argv: list[str] | None = None,
) -> HParams:
    """Build the experiment HParams, reference-CLI-compatible.

    Mirrors `/root/reference/utils/commons/hparams.py:25-131`:
    ``--config/--exp_name/--hparams/--infer/--validate/--reset`` flags, saved
    per-experiment ``config.yaml`` reuse unless ``--reset``.
    """
    if argv is not None:
        parser = argparse.ArgumentParser()
        parser.add_argument("--config", default=config)
        parser.add_argument("--exp_name", default=exp_name)
        parser.add_argument("--hparams", default=hparams_str)
        parser.add_argument("--infer", action="store_true")
        parser.add_argument("--validate", action="store_true")
        parser.add_argument("--reset", action="store_true")
        parser.add_argument("--debug", action="store_true")
        args, _ = parser.parse_known_args(argv)
    else:
        args = argparse.Namespace(
            config=config, exp_name=exp_name, hparams=hparams_str,
            infer=False, validate=False, reset=True, debug=False)

    cfg: dict = {}
    work_dir = os.path.join(work_dir_root, args.exp_name) if args.exp_name else ""
    saved_cfg_path = os.path.join(work_dir, "config.yaml") if work_dir else ""
    if saved_cfg_path and os.path.exists(saved_cfg_path) and not args.reset:
        with open(saved_cfg_path) as f:
            cfg = yaml.safe_load(f) or {}
    elif args.config:
        cfg = load_config(args.config)

    _deep_update(cfg, parse_hparams_overrides(args.hparams))
    cfg["work_dir"] = work_dir
    cfg["exp_name"] = args.exp_name
    cfg["infer"] = bool(args.infer)
    cfg["validate"] = bool(args.validate)

    if save and work_dir:
        os.makedirs(work_dir, exist_ok=True)
        if args.reset or not os.path.exists(saved_cfg_path):
            with open(saved_cfg_path, "w") as f:
                yaml.safe_dump(cfg, f, sort_keys=True)
    return HParams(cfg)


def hparams_to_json(hp: HParams) -> str:
    return json.dumps(hp.to_dict(), sort_keys=True, indent=2)
