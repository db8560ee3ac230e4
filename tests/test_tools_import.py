"""Smoke-import every tools/ script (perf/ops tooling is exercised manually
on the real chip, so a syntax error or API drift in one would otherwise go
unnoticed until an artifact run). All scripts are __main__-guarded; import
must be side-effect-free beyond config (enable_compile_cache is a no-op
config update on CPU).
"""

import importlib
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = sorted(
    f[:-3]
    for f in os.listdir(os.path.join(REPO, "tools"))
    if f.endswith(".py") and f != "__init__.py"
)


@pytest.mark.parametrize("name", TOOLS)
def test_tool_imports(name):
    mod = importlib.import_module(f"tools.{name}")
    assert mod is not None


@pytest.mark.parametrize("name", ["bench", "train", "extract", "__graft_entry__"])
def test_root_script_imports(name):
    mod = importlib.import_module(name)
    assert mod is not None
