"""All tools/ modules must stay importable (catches bitrot against the
package surface — e.g. a renamed model or deleted kernel referenced by a
bench script)."""

import importlib.util
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")
MODULES = sorted(f for f in os.listdir(TOOLS) if f.endswith(".py"))


@pytest.mark.parametrize("fname", MODULES)
def test_tool_imports(fname):
    spec = importlib.util.spec_from_file_location(
        f"tools_{fname[:-3]}", os.path.join(TOOLS, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)          # import side effects only
