"""Dataclass -> argparse CLI bridge.

The reference builds its CLI from dataclass configs with tyro
(nerfstudio/scripts/train.py:259-268, AnnotatedBaseConfigUnion). tyro is
not available here, so this is a small equivalent: nested dataclasses map
to --dotted.flag.names, subcommand registries map to argparse subparsers,
and the full resolved config serializes to config.yml for eval/render
tools to reload (configs/method_configs.py:70-89 behavior).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from enum import Enum
from pathlib import Path
from typing import Any, Optional, Union, get_args, get_origin


def _is_optional(t):
    return get_origin(t) is Union and type(None) in get_args(t)


def _unwrap_optional(t):
    args = [a for a in get_args(t) if a is not type(None)]
    return args[0] if args else str


def add_dataclass_args(parser: argparse.ArgumentParser, cls, prefix: str = ""):
    for f in dataclasses.fields(cls):
        if not f.init:
            continue
        name = f"{prefix}{f.name}"
        t = f.type if not isinstance(f.type, str) else None
        # resolve string annotations lazily via typing hints
        if t is None:
            import typing

            hints = typing.get_type_hints(cls)
            t = hints.get(f.name, str)
        if _is_optional(t):
            t = _unwrap_optional(t)
        default = (
            f.default
            if f.default is not dataclasses.MISSING
            else (
                f.default_factory()
                if f.default_factory is not dataclasses.MISSING
                else None
            )
        )
        if dataclasses.is_dataclass(t):
            add_dataclass_args(parser, t, prefix=f"{name}.")
            continue
        flag = "--" + name.replace("_", "-")
        if t is bool:
            parser.add_argument(
                flag, type=lambda s: s.lower() in ("1", "true", "yes"),
                default=default, metavar="BOOL",
            )
        elif t in (int, float, str):
            parser.add_argument(flag, type=t, default=default)
        elif t is Path:
            parser.add_argument(flag, type=Path, default=default)
        elif isinstance(t, type) and issubclass(t, Enum):
            parser.add_argument(
                flag, type=lambda s, tt=t: tt[s.upper()], default=default
            )
        elif get_origin(t) in (tuple, list) or t in (tuple, list):
            parser.add_argument(
                flag,
                type=lambda s: json.loads(s),
                default=default,
                metavar="JSON",
            )
        else:
            parser.add_argument(flag, type=str, default=default)


def dataclass_from_args(cls, args: argparse.Namespace, prefix: str = ""):
    kwargs: dict[str, Any] = {}
    import typing

    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        if not f.init:
            continue
        name = f"{prefix}{f.name}"
        t = hints.get(f.name, str)
        if _is_optional(t):
            t = _unwrap_optional(t)
        if dataclasses.is_dataclass(t):
            kwargs[f.name] = dataclass_from_args(t, args, prefix=f"{name}.")
        else:
            key = name.replace(".", "_") if not hasattr(args, name) else name
            val = getattr(args, name, getattr(args, key, None))
            if val is not None and (get_origin(t) is tuple or t is tuple) and isinstance(val, list):
                val = tuple(tuple(v) if isinstance(v, list) else v for v in val)
            kwargs[f.name] = val
    return cls(**kwargs)


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            "__dataclass__": f"{type(obj).__module__}.{type(obj).__qualname__}",
            **{
                f.name: _to_jsonable(getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            },
        }
    if isinstance(obj, Path):
        return {"__path__": str(obj)}
    if isinstance(obj, Enum):
        return {"__enum__": f"{type(obj).__module__}.{type(obj).__qualname__}", "name": obj.name}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    return obj


def _resolve(qualname: str):
    import importlib

    mod, _, name = qualname.rpartition(".")
    target = importlib.import_module(mod)
    for part in name.split("."):
        target = getattr(target, part)
    return target


def _from_jsonable(obj):
    if isinstance(obj, dict):
        if "__dataclass__" in obj:
            cls = _resolve(obj["__dataclass__"])
            fields = {
                k: _from_jsonable(v) for k, v in obj.items() if k != "__dataclass__"
            }
            # tuples come back as lists
            import typing

            hints = typing.get_type_hints(cls)
            for k, t in hints.items():
                if k in fields and (get_origin(t) is tuple or t is tuple) and isinstance(fields[k], list):
                    fields[k] = tuple(
                        tuple(x) if isinstance(x, list) else x for x in fields[k]
                    )
            return cls(**fields)
        if "__path__" in obj:
            return Path(obj["__path__"])
        if "__enum__" in obj:
            return _resolve(obj["__enum__"])[obj["name"]]
        return {k: _from_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_from_jsonable(x) for x in obj]
    return obj


def save_config(config, path: Path):
    """Serialize the resolved config (the reference writes config.yml)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(_to_jsonable(config), f, indent=2)


def load_config(path: Path):
    with open(path) as f:
        return _from_jsonable(json.load(f))
