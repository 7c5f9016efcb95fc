"""Signature-driven CLI construction.

The reference builds every entry-point CLI with ``jsonargparse.CLI(main)``
(e.g. ``generate/base.py:260-269``), deriving flags from the function
signature and docstring. This is a dependency-free equivalent on argparse:
``cli(main)`` exposes every parameter of ``main`` as ``--flag``, with types
from annotations (int/float/str/bool/Path, Optional[...], Literal-style
string choices) and help text parsed from the Google-style ``Args:`` section
of the docstring.
"""

from __future__ import annotations

import argparse
import inspect
import re
import typing
from pathlib import Path
from typing import Any, Callable, Optional


def _parse_arg_docs(docstring: Optional[str]) -> dict[str, str]:
    if not docstring:
        return {}
    docs: dict[str, str] = {}
    in_args = False
    current: Optional[str] = None
    for line in docstring.splitlines():
        stripped = line.strip()
        if stripped.startswith("Args:"):
            in_args = True
            continue
        if in_args:
            if stripped and not line.startswith(" "):
                break
            m = re.match(r"(\w+)\s*(?:\([^)]*\))?\s*:\s*(.*)", stripped)
            if m:
                current = m.group(1)
                docs[current] = m.group(2)
            elif current and stripped:
                docs[current] += " " + stripped
            elif not stripped:
                current = None
    return docs


def _unwrap_optional(tp: Any) -> tuple[Any, bool]:
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0], True
    return tp, False


def _str2bool(v: str) -> bool:
    if v.lower() in ("true", "1", "yes"):
        return True
    if v.lower() in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def build_parser(fn: Callable, parser: Optional[argparse.ArgumentParser] = None) -> argparse.ArgumentParser:
    sig = inspect.signature(fn)
    docs = _parse_arg_docs(fn.__doc__)
    summary = (fn.__doc__ or "").strip().split("\n\n")[0]
    parser = parser or argparse.ArgumentParser(
        description=summary, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    hints = typing.get_type_hints(fn)
    for name, param in sig.parameters.items():
        if param.kind in (param.VAR_POSITIONAL, param.VAR_KEYWORD):
            continue
        tp = hints.get(name, str if param.default is inspect.Parameter.empty else type(param.default))
        tp, is_optional = _unwrap_optional(tp)
        kwargs: dict[str, Any] = {"help": docs.get(name, "")}
        choices = None
        if typing.get_origin(tp) is typing.Literal:
            choices = list(typing.get_args(tp))
            tp = type(choices[0])
        if tp is bool:
            kwargs["type"] = _str2bool
        elif tp in (int, float, str, Path):
            kwargs["type"] = tp
        else:
            kwargs["type"] = str
        if choices:
            kwargs["choices"] = choices
        if param.default is inspect.Parameter.empty:
            kwargs["required"] = True
        else:
            kwargs["default"] = param.default
        parser.add_argument(f"--{name}", **kwargs)
    return parser


def cli(fn: Callable, args: Optional[list[str]] = None) -> Any:
    """Parse argv per ``fn``'s signature and call it."""
    parser = build_parser(fn)
    namespace = parser.parse_args(args)
    return fn(**vars(namespace))
