"""Churn-aware gate analysis: which registered queries have had their
implementing code touched since their last driver-green CORRECTNESS row?

A green row from round N certifies the code as of round N's commit; later
edits to any function a query executes silently age that evidence. The
driver's 50-slot gate should therefore lead with exactly these queries
(round-5 verdict item 3). This module computes the flagged set:

1. **Dependency walk** (`dep_functions`): from the registered query
   callable, transitively collect every function defined under this
   package that it can reach — via referenced globals (``co_names`` of the
   function and all nested code objects), closure cells, class methods,
   and function-local ``from bigdatapipelne_spark.x import y`` statements.
2. **Last green round** per query from the committed
   ``CORRECTNESS_r*.json`` rows (hash green where an oracle exists,
   rows-only green for the no-oracle-by-design paths).
3. **AST compare**: for each reachable function, extract its ``def`` node
   (docstring stripped, decorators INCLUDED — the decorator carries the
   oracle expression) from the file as of the last-green round's commit
   (``git show``) and from the working tree; any difference flags the
   query. Module-level constants referenced by a function's AST (e.g. the
   ``_SQL_TOKS`` oracle fragments) are compared too, expanded to a
   fixpoint within the module so constant-of-constant edits are caught.

Known blind spot (accepted): an oracle fragment constant imported from
ANOTHER module under an alias is tracked only if the alias name matches a
top-level assignment in the consuming module. In this repo every oracle
fragment lives in the module that uses it.

Run ``python -m bigdatapipelne_spark.devtools.churn`` to print the flagged
set; ``tests/test_gate_churn.py`` asserts every flagged query holds a
current gate slot.
"""

from __future__ import annotations

import ast
import glob
import importlib
import inspect
import json
import os
import re
import subprocess
import types
from functools import lru_cache

PKG = "bigdatapipelne_spark"
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Two alternatives because the name list's extent differs: a parenthesized
# import spans lines up to the ')'; a bare one ends at the newline (a
# single [\w,\s]+ group would greedily swallow the following statements
# and mangle every single-name import).
_LOCAL_IMPORT_RE = re.compile(
    r"from\s+(bigdatapipelne_spark[\w.]*)\s+import\s+(?:\(([^)]*)\)|([^\n]+))"
)


# ---------------------------------------------------------------------------
# Dependency walk
# ---------------------------------------------------------------------------


def _all_code_objects(code: types.CodeType):
    yield code
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            yield from _all_code_objects(const)


def _push(obj, stack: list) -> None:
    if isinstance(obj, types.FunctionType) and obj.__module__.startswith(PKG):
        stack.append(obj)
    elif isinstance(obj, type) and obj.__module__.startswith(PKG):
        for v in vars(obj).values():
            if isinstance(v, (types.FunctionType, staticmethod, classmethod)):
                fn = v.__func__ if not isinstance(v, types.FunctionType) else v
                stack.append(fn)


def dep_functions(fn) -> dict[tuple[str, str], types.FunctionType]:
    """All package functions transitively reachable from ``fn``, keyed by
    (module, qualname)."""
    seen: dict[tuple[str, str], types.FunctionType] = {}
    stack = [fn]
    while stack:
        f = stack.pop()
        key = (f.__module__, f.__qualname__)
        if key in seen:
            continue
        seen[key] = f
        g = getattr(f, "__globals__", {})
        names: set[str] = set()
        for code in _all_code_objects(f.__code__):
            names.update(code.co_names)
        for name in names:
            _push(g.get(name), stack)
        # module-attribute calls (``from pkg.sources import store`` +
        # ``store.commit_version(...)``): the module object itself is not
        # walkable, but co_names carries the LOAD_ATTR names — resolve
        # every (package-module, co_name) pair so functions reached only
        # through a module handle still churn-flag their callers (found
        # via store_vacuum NOT flagging on a commit_version edit, r8)
        mods = [
            v
            for v in g.values()
            if isinstance(v, types.ModuleType)
            and getattr(v, "__name__", "").startswith(PKG)
        ]
        for mod in mods:
            for name in names:
                _push(getattr(mod, name, None), stack)
        # closure cells (inner functions referencing enclosing-scope fns)
        for cell in f.__closure__ or ():
            try:
                _push(cell.cell_contents, stack)
            except ValueError:  # empty cell
                pass
        # function-local imports aren't visible in globals — parse source
        try:
            src = inspect.getsource(f)
        except (OSError, TypeError):
            src = ""
        for m in _LOCAL_IMPORT_RE.finditer(src):
            try:
                mod = importlib.import_module(m.group(1))
            except Exception:  # e.g. udaf modules need a live SparkContext
                continue
            for nm in (m.group(2) or m.group(3) or "").split(","):
                nm = nm.split(" as ")[0].strip()
                if not nm:
                    continue
                obj = getattr(mod, nm, None)
                if obj is None:
                    # ``from pkg.sources import store`` names a SUBMODULE,
                    # which is only an attribute of the package once
                    # something has imported it — do so
                    try:
                        obj = importlib.import_module(f"{m.group(1)}.{nm}")
                    except Exception:
                        obj = None
                _push(obj, stack)
                # locally-imported MODULE (``from pkg.sources import
                # store``): resolve its attributes named in co_names
                if isinstance(obj, types.ModuleType) and getattr(
                    obj, "__name__", ""
                ).startswith(PKG):
                    for name in names:
                        _push(getattr(obj, name, None), stack)
    return seen


# ---------------------------------------------------------------------------
# Git / round plumbing
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def round_commit(round_no: int) -> str | None:
    """Commit that added CORRECTNESS_r{N}.json — the snapshot whose code
    that round's rows certify (the driver commits the record immediately
    after the end-of-round snapshot; the delta is record files only).

    Round-boundary case (round-6 verdict item 1): between the driver
    writing a fresh record and committing it, the file exists on disk but
    has NO adding commit. Returning None there drops every green row of
    the newest round from both the last-green map and re-certification —
    exactly when the evidence is freshest. The record was produced against
    the end-of-round snapshot, which at that moment IS HEAD, so certify
    HEAD. (If the working tree has been edited since, the HEAD-vs-tree AST
    diff still flags the edits — HEAD is the certified snapshot, not the
    tree.)"""
    name = f"CORRECTNESS_r{round_no:02d}.json"
    out = subprocess.run(
        ["git", "log", "--format=%H", "--diff-filter=A", "--", name],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.split()
    if out:
        return out[0]
    if os.path.exists(os.path.join(REPO, name)):
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout.strip()
        return head or None
    return None


@lru_cache(maxsize=None)
def _file_at(commit: str, relpath: str) -> str | None:
    p = subprocess.run(
        ["git", "show", f"{commit}:{relpath}"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    return p.stdout if p.returncode == 0 else None


def last_green_rounds() -> dict[str, int]:
    """query -> highest round with a green row (hash green when the row
    carries a hash check, rows-green otherwise)."""
    greens: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            for name, row in json.load(fh).items():
                ok = (
                    row.get("hash_match")
                    if "hash_match" in row
                    else row.get("rows_match")
                )
                if ok and not row.get("error"):
                    greens[name] = max(greens.get(name, 0), rnd)
    return greens


# ---------------------------------------------------------------------------
# AST comparison
# ---------------------------------------------------------------------------


def _strip_docstring(node: ast.AST) -> ast.AST:
    body = getattr(node, "body", None)
    if (
        body
        and isinstance(body[0], ast.Expr)
        and isinstance(body[0].value, ast.Constant)
        and isinstance(body[0].value.value, str)
    ):
        node.body = body[1:] or [ast.Pass()]
    return node


@lru_cache(maxsize=None)
def _module_index(src_key: str, src: str):
    """Top-level defs and assigns of a module source. src_key only serves
    the cache (commit:path or 'WT:path')."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    defs: dict[str, ast.AST] = {}
    assigns: dict[str, ast.AST] = {}

    def index_defs(body, prefix=""):
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                defs[prefix + node.name] = node
                index_defs(node.body, prefix + node.name + ".")
            elif isinstance(node, ast.ClassDef):
                index_defs(node.body, prefix + node.name + ".")

    index_defs(tree.body)
    # assigns: MODULE level only — a function-local `tmp = ...` must not
    # shadow-register as a module constant (it would diff against every
    # other function's locals of the same name)
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    assigns[tgt.id] = node
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            assigns[node.target.id] = node
    return defs, assigns


def _dump_def(index, qualname: str) -> str | None:
    if index is None:
        return None
    defs, _ = index
    key = ".".join(p for p in qualname.split(".") if p != "<locals>")
    node = defs.get(key)
    if node is None:
        return None
    return ast.dump(_strip_docstring(node))


def _const_closure(index, seed_names: set[str]) -> dict[str, str]:
    """Module-level assignments reachable from seed_names, expanded to a
    fixpoint (constants built from other constants), as AST dumps."""
    if index is None:
        return {}
    _, assigns = index
    out: dict[str, str] = {}
    frontier = set(seed_names)
    while frontier:
        nxt: set[str] = set()
        for name in frontier:
            node = assigns.get(name)
            if node is None or name in out:
                continue
            out[name] = ast.dump(node)
            for sub in ast.walk(node):
                if isinstance(sub, ast.Name):
                    nxt.add(sub.id)
        frontier = nxt - set(out)
    return out


def _relpath_of_module(module: str) -> str | None:
    try:
        f = importlib.import_module(module).__file__
    except Exception:  # e.g. udaf modules need a live SparkContext
        return None
    return os.path.relpath(f, REPO) if f else None


def _index_at(commit: str | None, relpath: str):
    """Module index for ``relpath`` at ``commit`` (None = working tree)."""
    if commit is None:
        path = os.path.join(REPO, relpath)
        if not os.path.exists(path):
            return None
        return _module_index(f"WT:{relpath}", open(path).read())
    src = _file_at(commit, relpath)
    if src is None:
        return None
    return _module_index(f"{commit}:{relpath}", src)


def _query_items(fn) -> dict[tuple[str, str, str], str | None]:
    """All churn-tracked items a query depends on, with their WORKING-TREE
    dumps: ('def', module, qualname) for reachable functions and
    ('const', module, name) for module-level constants referenced from
    those functions' ASTs (closed over constant-of-constant chains)."""
    items: dict[tuple[str, str, str], str | None] = {}
    for (module, qual), _f in dep_functions(fn).items():
        relpath = _relpath_of_module(module)
        if relpath is None:
            continue
        idx = _index_at(None, relpath)
        dump = _dump_def(idx, qual)
        items[("def", module, qual)] = dump
        if idx is None:
            continue
        node = idx[0].get(".".join(p for p in qual.split(".") if p != "<locals>"))
        if node is None:
            continue
        seed = {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
        for cname, cdump in _const_closure(idx, seed).items():
            items[("const", module, cname)] = cdump
    return items


def _dump_at(commit: str, item: tuple[str, str, str]) -> str | None:
    kind, module, name = item
    relpath = _relpath_of_module(module)
    if relpath is None:
        return None
    idx = _index_at(commit, relpath)
    if idx is None:
        return None
    if kind == "def":
        return _dump_def(idx, name)
    node = idx[1].get(name)
    return ast.dump(node) if node is not None else None


def churned_queries(queries: dict | None = None) -> dict[str, list[str]]:
    """query name -> list of 'module.qualname' / 'module::CONST' items whose
    current definition (a) differs from the one the query's LAST GREEN
    round certified, and (b) has not been re-certified transitively — i.e.
    no other query that also executes the item has a green row from a
    round at which the item already had its current form. (b) keeps a
    change to shared plumbing (e.g. load_table's round-3 footer sniffing,
    green-driven by dozens of later rows) from flagging every historical
    query; a change NOBODY has driven since always flags. Queries with no
    lifetime green row are omitted (the lifetime-coverage tests already
    force them into the gate)."""
    if queries is None:
        from bigdatapipelne_spark.queries import QUERIES, finalize_registry

        finalize_registry()
        queries = QUERIES
    greens = last_green_rounds()
    per_query_items = {q: _query_items(fn) for q, fn in queries.items()}

    # item -> rounds whose green rows exercise it in some query
    cert_rounds: dict[tuple[str, str, str], set[int]] = {}
    for q, items in per_query_items.items():
        rnd = greens.get(q)
        if rnd is None or round_commit(rnd) is None:
            continue
        for item in items:
            cert_rounds.setdefault(item, set()).add(rnd)

    def recertified(item, cur_dump) -> bool:
        return any(
            _dump_at(round_commit(r), item) == cur_dump
            for r in cert_rounds.get(item, ())
        )

    flagged: dict[str, list[str]] = {}
    for qname, items in per_query_items.items():
        rnd = greens.get(qname)
        if rnd is None:
            continue
        commit = round_commit(rnd)
        if commit is None:
            continue
        diffs: list[str] = []
        for item, cur_dump in items.items():
            if _dump_at(commit, item) == cur_dump:
                continue
            if recertified(item, cur_dump):
                continue
            kind, module, name = item
            diffs.append(
                f"{module}.{name}" if kind == "def" else f"{module}::{name}"
            )
        if diffs:
            flagged[qname] = sorted(set(diffs))
    return flagged


def main() -> None:
    flagged = churned_queries()
    from bigdatapipelne_spark.queries import QUERIES

    gate = set(list(QUERIES)[:50])
    for qname, diffs in sorted(flagged.items()):
        mark = "GATED" if qname in gate else "UNGATED"
        print(f"{mark}  {qname}: {', '.join(diffs[:6])}")
    print(f"\n{len(flagged)} churned; {sum(1 for q in flagged if q not in gate)} lack a gate slot")


if __name__ == "__main__":
    main()
