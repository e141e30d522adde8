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


def _load_tool(fname):
    spec = importlib.util.spec_from_file_location(
        f"tools_{fname[:-3]}_reg", os.path.join(TOOLS, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_measure_baseline_registry_resolves():
    """Every name a MEASURES entry will touch at call time must already be
    bound at module scope — import alone missed a NameError in lambda bodies
    that broke `python tools/measure_baseline.py CNN-2D` (ADVICE r2 #1/#2)."""
    mod = _load_tool("measure_baseline.py")
    for key, fn in mod.MEASURES.items():
        assert callable(fn), key
        # direct refs are trivially bound; for lambdas, resolve every global
        # name their bytecode references against the module namespace
        code = getattr(fn, "__code__", None)
        if code is not None:
            import builtins
            import dis
            globals_loaded = {i.argval for i in dis.get_instructions(code)
                              if i.opname == "LOAD_GLOBAL"}
            for name in globals_loaded:
                ok = hasattr(mod, name) or hasattr(builtins, name)
                assert ok, (
                    f"MEASURES[{key!r}] references unbound name {name!r}")
