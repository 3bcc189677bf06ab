"""Every example script runs to completion on the CPU oracle tier.

Reference analog: the examples are compiled + smoke-run in CI; they define
the user-facing API contract (SURVEY.md §8)."""

import os
import runpy
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
ALL = sorted(
    f[:-3] for f in os.listdir(EXAMPLES_DIR)
    if f.endswith(".py") and not f.startswith("_")
)


@pytest.mark.parametrize("name", ALL)
def test_example_runs(name, capsys, monkeypatch):
    path = os.path.join(EXAMPLES_DIR, name + ".py")
    monkeypatch.syspath_prepend(os.path.join(EXAMPLES_DIR, ".."))
    # runpy does not add the script dir (unlike `python examples/x.py`)
    monkeypatch.syspath_prepend(EXAMPLES_DIR)
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{name} produced no output"
