#!/usr/bin/env python
"""Stdlib-only static lint gate: undefined names, unused imports, syntax.

The reference gates its CI on ruff + mypy --strict
(/root/reference/tox.ini:8-19, pyproject.toml:42-44).  This build
environment has no PyPI access (re-verified every round:
`pip install ruff mypy` -> "No matching distribution found"), so those
exact tools cannot run here.  This module is the EXECUTED counterpart:
a pyflakes-class checker built on the stdlib ``ast`` + ``symtable``
modules that runs as part of the test suite (tests/test_staticcheck.py)
on every CI invocation — a static gate that actually executes, not just
configuration.

Checks (per file):

  syntax            ``ast.parse`` failure is a finding, not a crash.
  undefined-name    a name resolved as GLOBAL_IMPLICIT or module-level
                    read with no module-level binding, not a builtin:
                    the typo class mypy/ruff F821 catches in rarely
                    executed branches.
  unused-import     an imported binding never referenced in its scope
                    (``__init__.py`` re-export surfaces honor ``__all__``
                    and are otherwise exempt, matching ruff's F401
                    ``__init__`` convention).

Suppression: a line containing ``# noqa`` is exempt (same contract as
ruff/flake8; used sparingly, each with a reason in a trailing comment).

Usage:
  python tools/staticcheck.py            # check the repo, exit 1 on findings
  python tools/staticcheck.py PATH ...   # check specific files/dirs
"""

from __future__ import annotations

import ast
import builtins
import sys
import symtable
from pathlib import Path

#: Names the runtime injects into every module namespace.
_MODULE_DUNDERS = {
    "__file__",
    "__name__",
    "__doc__",
    "__package__",
    "__spec__",
    "__loader__",
    "__builtins__",
    "__debug__",
    "__annotations__",
    "__dict__",
    "__path__",
    # class-body injections
    "__qualname__",
    "__module__",
    "__class__",
}

_BUILTINS = frozenset(dir(builtins)) | _MODULE_DUNDERS


def _noqa_lines(src: str) -> set[int]:
    return {
        i
        for i, line in enumerate(src.splitlines(), start=1)
        if "# noqa" in line
    }


def _module_bindings(tree: ast.Module) -> set[str]:
    """Every name BOUND at module level (assign/import/def/class/for/with/
    except/global-decl targets), found by walking the module body without
    descending into function bodies (their bindings are not module
    globals) but descending into if/try/loop/with blocks (theirs are)."""
    bound: set[str] = set()

    def bind_target(t: ast.AST) -> None:
        for node in ast.walk(t):
            if isinstance(node, ast.Name):
                bound.add(node.id)

    def visit_block(stmts) -> None:
        for s in stmts:
            if isinstance(s, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                bound.add(s.name)
                # decorators/bases run at module level but bind nothing
            elif isinstance(s, (ast.Import, ast.ImportFrom)):
                for a in s.names:
                    if a.name == "*":
                        continue
                    bound.add(a.asname or a.name.split(".")[0])
            elif isinstance(s, (ast.Assign, ast.AugAssign, ast.AnnAssign)):
                targets = s.targets if isinstance(s, ast.Assign) else [s.target]
                for t in targets:
                    bind_target(t)
            elif isinstance(s, (ast.For, ast.AsyncFor)):
                bind_target(s.target)
                visit_block(s.body)
                visit_block(s.orelse)
            elif isinstance(s, (ast.While, ast.If)):
                visit_block(s.body)
                visit_block(s.orelse)
            elif isinstance(s, (ast.With, ast.AsyncWith)):
                for item in s.items:
                    if item.optional_vars is not None:
                        bind_target(item.optional_vars)
                visit_block(s.body)
            elif isinstance(s, (ast.Try, getattr(ast, "TryStar", ast.Try))):
                visit_block(s.body)
                for h in s.handlers:
                    if h.name:
                        bound.add(h.name)
                    visit_block(h.body)
                visit_block(s.orelse)
                visit_block(s.finalbody)
            elif isinstance(s, ast.Match):
                # match-case capture/as/star/mapping-rest patterns bind
                # module-level names; case bodies are module scope too.
                for case in s.cases:
                    for node in ast.walk(case.pattern):
                        name = getattr(node, "name", None)
                        if isinstance(name, str):
                            bound.add(name)
                        rest = getattr(node, "rest", None)
                        if isinstance(rest, str):
                            bound.add(rest)
                    visit_block(case.body)
            elif isinstance(s, (ast.Global, ast.Nonlocal)):
                bound.update(s.names)
            elif isinstance(s, ast.Delete):
                pass  # del unbinds; treating as bound is the safe side
            elif isinstance(s, ast.Expr):
                # walrus in a module-level expression
                for node in ast.walk(s):
                    if isinstance(node, ast.NamedExpr):
                        bind_target(node.target)

    visit_block(tree.body)
    # walruses anywhere at module level (comprehension walrus leaks to
    # the enclosing scope per PEP 572)
    return bound


def _dunder_all(tree: ast.Module) -> set[str]:
    names: set[str] = set()
    for s in tree.body:
        targets = []
        if isinstance(s, ast.Assign):
            targets = s.targets
        elif isinstance(s, ast.AugAssign):
            targets = [s.target]
        if any(isinstance(t, ast.Name) and t.id == "__all__" for t in targets):
            for node in ast.walk(s):
                if isinstance(node, ast.Constant) and isinstance(node.value, str):
                    names.add(node.value)
    return names


def _import_lines(tree: ast.Module) -> dict[str, int]:
    """name -> line for every import binding in the MODULE scope."""
    out: dict[str, int] = {}
    for s in ast.walk(tree):
        if isinstance(s, (ast.Import, ast.ImportFrom)):
            for a in s.names:
                if a.name == "*":
                    continue
                out[a.asname or a.name.split(".")[0]] = s.lineno
    return out


def _symbol_use_lines(tree: ast.Module) -> dict[str, int]:
    """name -> first LOAD line (for locating undefined-name findings)."""
    out: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            out.setdefault(node.id, node.lineno)
    return out


def check_file(path: Path) -> list[str]:
    src = path.read_text()
    findings: list[str] = []
    noqa = _noqa_lines(src)

    try:
        tree = ast.parse(src, filename=str(path))
        table = symtable.symtable(src, str(path), "exec")
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    module_bound = _module_bindings(tree)
    exported = _dunder_all(tree)
    use_lines = _symbol_use_lines(tree)
    is_init = path.name == "__init__.py"
    # Names LOADed anywhere in the file (symtable's module-scope
    # is_referenced() misses uses from nested scopes).
    loaded_anywhere = set(use_lines)

    def line_of(name: str) -> int:
        return use_lines.get(name, 1)

    # ---- undefined names -------------------------------------------------
    def scan(tab: symtable.SymbolTable, in_module: bool) -> None:
        for sym in tab.get_symbols():
            name = sym.get_name()
            if not sym.is_referenced():
                continue
            if in_module:
                defined_here = (
                    sym.is_assigned() or sym.is_imported() or sym.is_namespace()
                )
                if defined_here or name in module_bound or name in _BUILTINS:
                    continue
                if line_of(name) in noqa:
                    continue
                findings.append(
                    f"{path}:{line_of(name)}: undefined name '{name}'"
                )
            else:
                # inside a function/class/comprehension scope: a symbol the
                # compiler resolved to the module scope must exist there
                if not sym.is_global():
                    continue
                if name in module_bound or name in _BUILTINS:
                    continue
                if line_of(name) in noqa:
                    continue
                findings.append(
                    f"{path}:{line_of(name)}: undefined name '{name}'"
                )
        for child in tab.get_children():
            scan(child, in_module=False)

    scan(table, in_module=True)

    # ---- unused imports (module scope) ------------------------------------
    # __init__.py files are re-export surfaces: only check them when they
    # declare __all__ (then an import neither loaded nor exported is dead).
    if not is_init or exported:
        imports = _import_lines(tree)
        for name, lineno in imports.items():
            if name in loaded_anywhere or name in exported:
                continue
            if lineno in noqa or name == "annotations":
                continue
            suffix = " (not re-exported via __all__)" if is_init else ""
            findings.append(
                f"{path}:{lineno}: unused import '{name}'{suffix}"
            )

    return findings


#: The repo surface the gate covers.
DEFAULT_TARGETS = (
    "zfista_tpu",
    "tests",
    "examples",
    "tools",
    "bench.py",
    "runtests.py",
    "__graft_entry__.py",
)


def iter_files(targets) -> list[Path]:
    files: list[Path] = []
    for t in targets:
        p = Path(t)
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            files.append(p)
    return files


def run(targets=None) -> list[str]:
    root = Path(__file__).resolve().parent.parent
    if targets is None:
        targets = [root / t for t in DEFAULT_TARGETS]
    findings: list[str] = []
    for f in iter_files(targets):
        findings.extend(check_file(f))
    return findings


def main(argv=None) -> int:
    args = sys.argv[1:] if argv is None else argv
    findings = run(args or None)
    for line in findings:
        print(line)
    n = len(iter_files([Path(__file__).resolve().parent.parent / t for t in DEFAULT_TARGETS] if not args else args))
    print(f"staticcheck: {len(findings)} finding(s) in {n} file(s)")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
