"""Unit tests for the churn analyzer's building blocks (devtools/churn.py)
— the integration guard (test_gate_churn.py) only proves the end-to-end
verdict; these pin the pieces a refactor could silently break."""

from __future__ import annotations

import textwrap

from bigdatapipelne_spark.devtools import churn


def _index(src: str):
    src = textwrap.dedent(src)
    return churn._module_index(f"TEST:{hash(src)}", src)


def test_module_index_nested_defs_and_module_level_assigns_only():
    idx = _index(
        '''
        TOP = 1

        def outer():
            local = 2  # must NOT register as a module constant

            def inner():
                pass

        class K:
            def method(self):
                tmp = 3
        '''
    )
    defs, assigns = idx
    assert set(defs) == {"outer", "outer.inner", "K.method"}
    assert set(assigns) == {"TOP"}, "function-local assigns leaked into the index"


def test_dump_def_strips_docstring_but_keeps_decorators():
    a = _index(
        '''
        @deco("oracle one")
        def f():
            """doc v1"""
            return 1
        '''
    )
    b = _index(
        '''
        @deco("oracle one")
        def f():
            """doc v2 — reworded only"""
            return 1
        '''
    )
    c = _index(
        '''
        @deco("oracle CHANGED")
        def f():
            """doc v1"""
            return 1
        '''
    )
    da, db, dc = (churn._dump_def(i, "f") for i in (a, b, c))
    assert da == db, "a docstring-only edit must not flag churn"
    assert da != dc, "a decorator (oracle expression) edit MUST flag churn"


def test_dump_def_resolves_locals_qualname():
    idx = _index(
        '''
        def outer():
            def inner():
                return 7
        '''
    )
    assert churn._dump_def(idx, "outer.<locals>.inner") is not None


def test_const_closure_follows_constant_chains():
    idx = _index(
        '''
        BASE = "x"
        DERIVED = BASE + "y"
        UNRELATED = 3

        def f():
            return DERIVED
        '''
    )
    out = churn._const_closure(idx, {"DERIVED"})
    assert set(out) == {"DERIVED", "BASE"}, "constant-of-constant chain missed"


def test_dep_functions_walks_locals_closures_and_local_imports():
    from bigdatapipelne_spark.queries import QUERIES, finalize_registry

    finalize_registry()
    # stage_events imports apply_mapping inside the function body
    deps = churn.dep_functions(QUERIES["stage_events"])
    names = {qual for (_mod, qual) in deps}
    assert "apply_mapping" in names, "function-local import not walked"
    assert "load_table" in names, "global reference not walked"


def test_last_green_rounds_reads_committed_records():
    greens = churn.last_green_rounds()
    # stage_events went green in round 1 and has appeared since
    assert greens.get("stage_events", 0) >= 1
    # every value maps to a resolvable commit
    some = list(greens.values())[0]
    assert churn.round_commit(some)
