"""CLI builder tests (signature-derived argparse, jsonargparse replacement)."""

from pathlib import Path
from typing import Optional

import pytest

from parrot_tpu.utils.cli import build_parser, cli


def example(
    name: str = "x",
    count: int = 3,
    rate: float = 0.5,
    flag: bool = False,
    path: Path = Path("/tmp"),
    maybe: Optional[int] = None,
) -> dict:
    """Example command.

    Args:
        name: The name argument.
        count: How many.
        rate: A float.
        flag: A boolean switch.
        path: A filesystem path.
        maybe: Optional integer.
    """
    return dict(name=name, count=count, rate=rate, flag=flag, path=path, maybe=maybe)


def test_defaults_and_types():
    out = cli(example, args=[])
    assert out == dict(name="x", count=3, rate=0.5, flag=False, path=Path("/tmp"), maybe=None)

    out = cli(example, args=[
        "--name", "y", "--count", "7", "--rate", "0.25", "--flag", "true",
        "--path", "/data", "--maybe", "42",
    ])
    assert out["count"] == 7 and isinstance(out["count"], int)
    assert out["rate"] == 0.25
    assert out["flag"] is True
    assert out["path"] == Path("/data")
    assert out["maybe"] == 42


def test_bool_rejects_garbage(capsys):
    with pytest.raises(SystemExit):
        cli(example, args=["--flag", "banana"])


def test_help_contains_docstrings(capsys):
    parser = build_parser(example)
    help_text = parser.format_help()
    assert "The name argument." in help_text
    assert "--maybe" in help_text


def test_required_when_no_default():
    def f(x: int):  # noqa: required arg
        return x

    with pytest.raises(SystemExit):
        cli(f, args=[])
    assert cli(f, args=["--x", "5"]) == 5
