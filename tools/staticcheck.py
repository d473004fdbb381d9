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
  shadowed-builtin  a module-level assignment/def or function parameter
                    that rebinds a builtin whose shadowing is a classic
                    bug vector (ruff A001/A002 class, curated list — the
                    full builtin set would flag idiomatic ``input``-less
                    code noise).
  unused-local      a function-local simple assignment never read
                    anywhere in the function (incl. nested scopes) —
                    ruff F841 class.  ``_``-prefixed names, tuple
                    unpacking, parameters, and ``global``/``nonlocal``
                    declarations are exempt (ruff's default F841
                    conventions).
  format-arity      literal ``"..%s.." % (tuple)`` with a conversion/
                    tuple length mismatch (F507 class), literal
                    ``"{}..".format(args)`` with more positional
                    placeholders than arguments (F524 class), and
                    f-strings with no placeholders at all (F541 class).
  call-arity        a bare-name call of a same-module plain function
                    with too many positional arguments, too few
                    required arguments, or an unknown keyword — the
                    refactor-drift class mypy catches.  Conservative:
                    decorated functions, methods, *args/**kwargs defs,
                    starred/double-starred call sites, and rebound
                    names are all exempt.

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


def _module_binding_list(tree: ast.Module) -> list[str]:
    """Every name BOUND at module level (assign/import/def/class/for/with/
    except/global-decl targets), AS A LIST (one entry per binding site, so
    callers can count rebindings — e.g. a ``def`` plus a ``try: from
    fast_impl import f`` fallback is two bindings of ``f``), found by
    walking the module body without descending into function bodies
    (their bindings are not module globals) but descending into
    if/try/loop/with blocks (theirs are)."""
    bound: list[str] = []

    def bind_target(t: ast.AST) -> None:
        for node in ast.walk(t):
            if isinstance(node, ast.Name):
                bound.append(node.id)

    def visit_block(stmts) -> None:
        for s in stmts:
            if isinstance(s, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                bound.append(s.name)
                # decorators/bases run at module level but bind nothing
            elif isinstance(s, (ast.Import, ast.ImportFrom)):
                for a in s.names:
                    if a.name == "*":
                        continue
                    bound.append(a.asname or a.name.split(".")[0])
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
                        bound.append(h.name)
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
                            bound.append(name)
                        rest = getattr(node, "rest", None)
                        if isinstance(rest, str):
                            bound.append(rest)
                    visit_block(case.body)
            elif isinstance(s, (ast.Global, ast.Nonlocal)):
                bound.extend(s.names)
            elif isinstance(s, ast.Delete):
                pass  # del unbinds; treating as bound is the safe side

    visit_block(tree.body)
    # Walruses ANYWHERE at module level — if/while tests, assignment
    # values, comprehensions (whose walrus leaks to the enclosing scope
    # per PEP 572) — excluding nested function/class scopes (review
    # finding: the old scan only saw bare Expr statements).
    stack = list(tree.body)
    while stack:
        node = stack.pop()
        if isinstance(
            node,
            (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda, ast.ClassDef),
        ):
            continue
        if isinstance(node, ast.NamedExpr):
            bind_target(node.target)
        stack.extend(ast.iter_child_nodes(node))
    return bound


def _module_bindings(tree: ast.Module) -> set[str]:
    """Set view of :func:`_module_binding_list`."""
    return set(_module_binding_list(tree))


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


#: Builtins whose shadowing is a classic bug vector (A001/A002 class).
#: Curated: flagging the FULL builtin set would bury real findings under
#: idiomatic noise (``id``/``type`` locals are ubiquitous and harmless in
#: small scopes); these are the ones that silently break later stdlib
#: calls in the same module or hide a typo'd call.
_SHADOW_BUILTINS = frozenset({
    "list", "dict", "set", "tuple", "str", "int", "float", "bool", "bytes",
    "len", "open", "print", "range", "sorted", "reversed", "enumerate",
    "zip", "isinstance", "issubclass", "getattr", "setattr", "hasattr",
    "super", "property", "staticmethod", "classmethod", "iter",
})


def _check_shadowed_builtins(tree: ast.Module, path: Path, noqa: set[int]) -> list[str]:
    findings: list[str] = []

    def flag(name: str, lineno: int, what: str) -> None:
        if name in _SHADOW_BUILTINS and lineno not in noqa:
            findings.append(
                f"{path}:{lineno}: {what} '{name}' shadows a builtin"
            )

    def visit_block(stmts) -> None:
        """Module- and class-level statements only: function bodies get
        parameter checks but their locals are too short-lived to matter."""
        for s in stmts:
            if isinstance(s, (ast.FunctionDef, ast.AsyncFunctionDef)):
                flag(s.name, s.lineno, "function name")
            elif isinstance(s, ast.ClassDef):
                flag(s.name, s.lineno, "class name")
                visit_block(s.body)
            elif isinstance(s, (ast.Assign, ast.AnnAssign)):
                targets = s.targets if isinstance(s, ast.Assign) else [s.target]
                for t in targets:
                    for node in ast.walk(t):
                        # Store ctx only: `table[len(xs)] = 1` mentions
                        # `len` in Load context inside the target and
                        # must not flag (review finding).
                        if isinstance(node, ast.Name) and isinstance(
                            node.ctx, ast.Store
                        ):
                            flag(node.id, s.lineno, "assignment")
            elif isinstance(s, (ast.Import, ast.ImportFrom)):
                for a in s.names:
                    if a.name != "*":
                        flag(a.asname or a.name.split(".")[0], s.lineno, "import")
            elif isinstance(s, (ast.If, ast.While)):
                visit_block(s.body)
                visit_block(s.orelse)
            elif isinstance(s, (ast.For, ast.AsyncFor)):
                visit_block(s.body)
                visit_block(s.orelse)
            elif isinstance(s, (ast.With, ast.AsyncWith)):
                visit_block(s.body)
            elif isinstance(s, (ast.Try, getattr(ast, "TryStar", ast.Try))):
                visit_block(s.body)
                for h in s.handlers:
                    visit_block(h.body)
                visit_block(s.orelse)
                visit_block(s.finalbody)

    visit_block(tree.body)

    # Function PARAMETERS shadowing (A002) anywhere in the file.
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
            a = node.args
            params = (
                a.posonlyargs + a.args + a.kwonlyargs
                + ([a.vararg] if a.vararg else [])
                + ([a.kwarg] if a.kwarg else [])
            )
            for p in params:
                flag(p.arg, p.lineno, "parameter")
    return findings


def _check_unused_locals(tree: ast.Module, path: Path, noqa: set[int]) -> list[str]:
    """F841 class: a simple-Name assignment in a function scope whose name
    is never loaded anywhere inside that function (nested scopes included,
    so closure captures count as uses)."""
    findings: list[str] = []

    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        declared: set[str] = set()
        loads: set[str] = set()
        stores: dict[str, int] = {}
        inner_fn_names: set[str] = set()
        for node in ast.walk(fn):
            if isinstance(node, (ast.Global, ast.Nonlocal)):
                declared.update(node.names)
            elif isinstance(node, ast.Name):
                if isinstance(node.ctx, ast.Load):
                    loads.add(node.id)
                elif isinstance(node.ctx, ast.Del):
                    loads.add(node.id)  # del requires the binding to exist
            elif (
                isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
                and node is not fn
            ):
                inner_fn_names.add(node.name)
        # Only SIMPLE single-Name assignment targets are candidates —
        # tuple unpacking, subscripts, attributes, for-targets, walrus and
        # with-targets are all exempt (ruff's F841 conventions).  Nested
        # functions' own assignments are excluded here (each function gets
        # its own visit); their LOADS still count as uses above, so a
        # closure-captured local is never flagged.
        for node in _function_own_nodes(fn):
            if isinstance(node, ast.Assign) and len(node.targets) == 1:
                t = node.targets[0]
                if isinstance(t, ast.Name):
                    stores[t.id] = node.lineno
            elif isinstance(node, ast.AnnAssign) and node.value is not None:
                if isinstance(node.target, ast.Name):
                    stores[node.target.id] = node.lineno
        for name, lineno in sorted(stores.items(), key=lambda kv: kv[1]):
            if (
                name.startswith("_")
                or name in loads
                or name in declared
                or name in inner_fn_names
                or lineno in noqa
            ):
                continue
            findings.append(
                f"{path}:{lineno}: local variable '{name}' is assigned but never used"
            )
    return findings


def _function_own_nodes(fn):
    """Walk a function's body WITHOUT descending into nested function/class
    scopes (their assignments are their own scope's business)."""
    stack = list(fn.body)
    while stack:
        node = stack.pop()
        yield node
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda, ast.ClassDef)):
            continue
        stack.extend(ast.iter_child_nodes(node))


_PERCENT_RE = None  # lazily compiled


def _percent_conversion_count(fmt: str) -> int | None:
    """Number of %-conversions consuming an argument; None if the string
    uses mapped ``%(name)s`` conversions or ``*`` widths (not countable)."""
    import re

    global _PERCENT_RE
    if _PERCENT_RE is None:
        _PERCENT_RE = re.compile(
            r"%(?:(?P<map>\([^)]*\))?[-# +0]*(?P<width>\*|\d+)?"
            r"(?:\.(?P<prec>\*|\d+))?[hlL]?(?P<conv>[diouxXeEfFgGcrsab%]))"
        )
    n = 0
    for mo in _PERCENT_RE.finditer(fmt):
        if mo.group("conv") == "%":
            continue
        if mo.group("map"):
            return None
        if mo.group("width") == "*" or mo.group("prec") == "*":
            return None
        n += 1
    return n


def _check_format_arity(tree: ast.Module, path: Path, noqa: set[int]) -> list[str]:
    findings: list[str] = []
    # A FormattedValue's format_spec (the ``:4d`` part) is ITSELF a
    # JoinedStr node, usually all-Constant — exclude those from the
    # no-placeholder f-string check or every format spec false-positives.
    spec_ids = {
        id(n.format_spec)
        for n in ast.walk(tree)
        if isinstance(n, ast.FormattedValue) and n.format_spec is not None
    }
    for node in ast.walk(tree):
        if getattr(node, "lineno", None) in noqa:
            continue
        # "..." % (a, b)  with a literal tuple right-hand side (F507).
        if (
            isinstance(node, ast.BinOp)
            and isinstance(node.op, ast.Mod)
            and isinstance(node.left, ast.Constant)
            and isinstance(node.left.value, str)
            and isinstance(node.right, ast.Tuple)
            and not any(isinstance(e, ast.Starred) for e in node.right.elts)
        ):
            want = _percent_conversion_count(node.left.value)
            have = len(node.right.elts)
            if want is not None and want != have:
                findings.append(
                    f"{path}:{node.lineno}: %-format string expects {want} "
                    f"argument(s), tuple has {have}"
                )
        # "{} {}".format(a) with countable positional placeholders (F524).
        elif (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "format"
            and isinstance(node.func.value, ast.Constant)
            and isinstance(node.func.value.value, str)
            and not any(isinstance(a, ast.Starred) for a in node.args)
        ):
            import string

            try:
                fields = list(string.Formatter().parse(node.func.value.value))
            except ValueError:
                continue
            auto = sum(1 for _, f, _, _ in fields if f == "")
            indexed = [int(f) for _, f, _, _ in fields if f and f.isdigit()]
            need = auto if auto else (max(indexed) + 1 if indexed else 0)
            if need > len(node.args):
                findings.append(
                    f"{path}:{node.lineno}: .format() uses {need} positional "
                    f"placeholder(s) but is given {len(node.args)}"
                )
        # f"no placeholders" (F541) — almost always a forgotten f or a
        # plain string that was meant to interpolate.
        elif (
            isinstance(node, ast.JoinedStr)
            and id(node) not in spec_ids
            and not any(
                isinstance(v, ast.FormattedValue) for v in node.values
            )
        ):
            findings.append(
                f"{path}:{node.lineno}: f-string without any placeholders"
            )
    return findings


def _check_call_arity(tree: ast.Module, path: Path, noqa: set[int]) -> list[str]:
    """mypy-class call-arity drift for SAME-MODULE plain functions.

    Only module-level ``def`` without decorators and without
    ``*args``/``**kwargs`` participate; a name bound more than once at
    module level — reassignment, a ``try: from fast_impl import f``
    fallback, conditional def, a module-level walrus, or a ``global``
    rebinding from any function — is dropped.  Call sites using
    ``*seq``/``**map`` are skipped, and calls are resolved with SCOPE
    AWARENESS: a name shadowed by a parameter or local binding of any
    enclosing function/lambda scope, by a comprehension target, or by a
    class-body binding is not (or may not be) the module function, so
    the call is skipped — shadowing is always resolved in the
    conservative direction (skip, never false-positive).  Within those
    bounds the coverage check follows CPython's binding rules:
    positionals fill left-to-right, keywords may fill remaining
    non-positional-only params, a keyword naming an already-filled
    param is a 'multiple values' error, and required keyword-only
    params must be named."""
    from collections import Counter

    bound_counts = Counter(_module_binding_list(tree))
    # A `global f` + assignment inside ANY function rebinds the module
    # name at some runtime point — drop such names entirely (review
    # finding: the module-level scan cannot see these).
    global_rebinds: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Global):
            global_rebinds.update(node.names)

    sigs: dict[str, tuple] = {}
    for s in tree.body:
        if not isinstance(s, ast.FunctionDef):
            continue
        if (
            s.decorator_list
            or bound_counts.get(s.name, 0) != 1
            or s.name in global_rebinds
        ):
            continue
        a = s.args
        if a.vararg or a.kwarg:
            continue
        pos_names = [p.arg for p in a.posonlyargs + a.args]
        n_posonly = len(a.posonlyargs)
        n_pos = len(pos_names)
        n_required = n_pos - len(a.defaults)
        kw_fillable = set(pos_names[n_posonly:]) | {p.arg for p in a.kwonlyargs}
        required_kwonly = {
            p.arg
            for p, d in zip(a.kwonlyargs, a.kw_defaults)
            if d is None
        }
        sigs[s.name] = (pos_names, n_pos, n_required, kw_fillable, required_kwonly)

    findings: list[str] = []

    def local_bound(fn) -> set[str]:
        """Names bound in a function/lambda scope (params + Store targets
        + nested def/class names + imports + handler targets), NOT
        descending into nested function scopes."""
        a = fn.args
        names: set[str] = set()
        for p in a.posonlyargs + a.args + a.kwonlyargs:
            names.add(p.arg)
        if a.vararg:
            names.add(a.vararg.arg)
        if a.kwarg:
            names.add(a.kwarg.arg)
        body = fn.body if not isinstance(fn, ast.Lambda) else [fn.body]
        stack = list(body)
        while stack:
            node = stack.pop()
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                names.add(node.name)
                continue  # nested scope: only its NAME binds here
            if isinstance(node, ast.Lambda):
                continue
            if isinstance(node, ast.Name) and isinstance(
                node.ctx, (ast.Store, ast.Del)
            ):
                names.add(node.id)
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                for al in node.names:
                    if al.name != "*":
                        names.add(al.asname or al.name.split(".")[0])
            elif isinstance(node, ast.ExceptHandler) and node.name:
                names.add(node.name)
            stack.extend(ast.iter_child_nodes(node))
        return names

    def class_body_bound(cls: ast.ClassDef) -> set[str]:
        """Names bound at CLASS-BODY level (methods, class attributes,
        imports) — they shadow module names for class-body expressions.
        Over-shadowing methods' bodies too is deliberate: CPython skips
        the class scope when resolving bare names inside methods, but
        skipping a check is the safe direction while re-enabling it
        would need exact scope rules."""
        names: set[str] = set()
        stack = list(cls.body)
        while stack:
            node = stack.pop()
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                names.add(node.name)
                continue
            if isinstance(node, ast.Lambda):
                continue
            if isinstance(node, ast.Name) and isinstance(
                node.ctx, (ast.Store, ast.Del)
            ):
                names.add(node.id)
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                for al in node.names:
                    if al.name != "*":
                        names.add(al.asname or al.name.split(".")[0])
            stack.extend(ast.iter_child_nodes(node))
        return names

    def comp_targets(node) -> set[str]:
        names: set[str] = set()
        for gen in node.generators:
            for n in ast.walk(gen.target):
                if isinstance(n, ast.Name):
                    names.add(n.id)
        return names

    def check_call(node: ast.Call) -> None:
        name = node.func.id
        pos_names, n_pos, n_required, kw_fillable, required_kwonly = sigs[name]
        if node.lineno in noqa:
            return
        if any(isinstance(arg, ast.Starred) for arg in node.args) or any(
            kw.arg is None for kw in node.keywords
        ):
            return
        given_kw = {kw.arg for kw in node.keywords}
        n_given = len(node.args)
        if n_given > n_pos:
            findings.append(
                f"{path}:{node.lineno}: call to '{name}' passes "
                f"{n_given} positional argument(s), it accepts at most {n_pos}"
            )
            return
        filled_pos = set(pos_names[:n_given])
        dup = given_kw & filled_pos
        bad_kw = given_kw - kw_fillable
        missing = [
            nm
            for nm in pos_names[n_given:n_required]
            if nm not in given_kw
        ] + sorted(required_kwonly - given_kw)
        if dup:
            findings.append(
                f"{path}:{node.lineno}: call to '{name}' passes "
                f"{sorted(dup)} both positionally and by keyword"
            )
        elif bad_kw:
            findings.append(
                f"{path}:{node.lineno}: call to '{name}' passes "
                f"unknown keyword(s) {sorted(bad_kw)}"
            )
        elif missing:
            findings.append(
                f"{path}:{node.lineno}: call to '{name}' is missing "
                f"required argument(s) {missing}"
            )

    # Iterative scope-carrying walk (explicit stack: unbounded recursion
    # on deep expression trees crashed the gate — review finding).
    _COMPS = (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)
    stack = [(tree, frozenset())]
    while stack:
        node, shadowed = stack.pop()
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
            shadowed = shadowed | local_bound(node)
        elif isinstance(node, ast.ClassDef):
            shadowed = shadowed | class_body_bound(node)
        elif isinstance(node, _COMPS):
            shadowed = shadowed | comp_targets(node)
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id in sigs
            and node.func.id not in shadowed
        ):
            check_call(node)
        for child in ast.iter_child_nodes(node):
            stack.append((child, shadowed))
    return findings


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

    findings.extend(_check_shadowed_builtins(tree, path, noqa))
    findings.extend(_check_unused_locals(tree, path, noqa))
    findings.extend(_check_format_arity(tree, path, noqa))
    findings.extend(_check_call_arity(tree, path, noqa))

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
