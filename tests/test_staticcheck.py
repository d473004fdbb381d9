"""The executed static-lint gate (tools/staticcheck.py).

The reference gates CI on ruff + mypy (reference tox.ini:8-19); this
environment has no PyPI access, so the stdlib checker is the executed
counterpart.  This test is the gate: the repo must be finding-free, and
the checker must actually DETECT the bug classes it claims (a clean
report from a broken checker is worthless — each class is seeded and
asserted caught).
"""

import sys
import textwrap
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import staticcheck  # noqa: E402  (path-injected tools import)


def _check(tmp_path, source, name="mod.py"):
    p = tmp_path / name
    p.write_text(textwrap.dedent(source))
    return staticcheck.check_file(p)


def test_detects_undefined_name_in_function(tmp_path):
    out = _check(
        tmp_path,
        """
        def f(x):
            return x + undefined_helper(x)
        """,
    )
    assert any("undefined name 'undefined_helper'" in m for m in out)


def test_detects_undefined_name_at_module_level(tmp_path):
    out = _check(tmp_path, "y = not_defined_anywhere + 1\n")
    assert any("undefined name 'not_defined_anywhere'" in m for m in out)


def test_detects_unused_import(tmp_path):
    out = _check(tmp_path, "import os\nimport sys\nprint(sys.argv)\n")
    assert any("unused import 'os'" in m for m in out)
    assert not any("'sys'" in m for m in out)


def test_detects_syntax_error(tmp_path):
    out = _check(tmp_path, "def broken(:\n")
    assert any("syntax error" in m for m in out)


def test_noqa_suppresses(tmp_path):
    out = _check(
        tmp_path,
        """
        import os  # noqa - intentionally exercised by name elsewhere
        y = maybe_injected  # noqa - documented dynamic global
        """,
    )
    assert out == []


def test_no_false_positives_on_legit_constructs(tmp_path):
    out = _check(
        tmp_path,
        '''
        """Module doc."""
        from __future__ import annotations

        import os
        from functools import wraps

        try:
            import json as j
        except ImportError:
            j = None

        CONST = os.sep

        def deco(fn):
            @wraps(fn)
            def inner(*a, **k):
                return fn(*a, **k)
            return inner

        @deco
        def f(x: "os.PathLike", y=CONST) -> os.PathLike:
            total = sum(v for v in range(int(x)))
            if (n := total) > 0:
                total += n
            return j.dumps(total) if j else total

        class C:
            attr = CONST

            def m(self):
                global CONST
                return f(CONST)

        for _i in range(2):
            pass

        with open(os.devnull) as fh:
            DATA = fh.read()
        ''',
    )
    assert out == []


def test_no_false_positives_on_module_level_match(tmp_path):
    """match-case capture/as/star/mapping-rest patterns bind module
    globals; names they bind (and names bound in case bodies) must not be
    reported undefined when read from a nested scope (round-4 review
    finding: _module_bindings skipped ast.Match entirely)."""
    out = _check(
        tmp_path,
        """
        import sys

        match sys.argv:
            case [prog, *rest]:
                MODE = "args"
            case {"k": v, **extra}:
                MODE = "map"
            case object() as whole:
                MODE = "other"

        def report():
            return prog, rest, v, extra, whole, MODE
        """,
    )
    assert out == []


def test_init_reexports_honored(tmp_path):
    # no __all__: a pure re-export surface is exempt
    out = _check(tmp_path, "from os import sep\n", name="__init__.py")
    assert out == []
    # with __all__: exported names pass, dead imports are flagged
    out = _check(
        tmp_path,
        """
        from os import sep, altsep

        __all__ = ["sep"]
        """,
        name="__init__.py",
    )
    assert any("'altsep'" in m for m in out)
    assert not any("'sep'" in m for m in out)


def test_repo_is_finding_free():
    """The actual gate: the whole repo surface (package, tests, examples,
    tools, entry scripts) has zero findings."""
    findings = staticcheck.run()
    assert findings == [], "\n".join(findings)


def test_detects_shadowed_builtin_assignment(tmp_path):
    out = _check(tmp_path, "list = [1, 2]\nprint(list)\n")
    assert any("assignment 'list' shadows a builtin" in m for m in out)


def test_detects_shadowed_builtin_parameter(tmp_path):
    out = _check(
        tmp_path,
        """
        def f(dict, other):
            return dict, other
        """,
    )
    assert any("parameter 'dict' shadows a builtin" in m for m in out)
    assert not any("'other'" in m for m in out)


def test_shadowed_builtin_curated_not_total(tmp_path):
    # ``id``-class shadowing is idiomatic and deliberately NOT flagged;
    # # noqa suppresses the flagged class.
    out = _check(
        tmp_path,
        """
        def f(id, type):
            return id, type
        len = 3  # noqa - seeded suppression
        print(len)
        """,
    )
    assert out == []


def test_detects_unused_local(tmp_path):
    out = _check(
        tmp_path,
        """
        def f(x):
            y = x + 1
            unused = x * 2
            return y
        """,
    )
    assert any("local variable 'unused' is assigned but never used" in m for m in out)
    assert not any("'y'" in m for m in out)


def test_unused_local_exemptions(tmp_path):
    # underscore names, tuple unpacking, closure captures, for-targets,
    # and global declarations are all exempt (ruff F841 conventions).
    out = _check(
        tmp_path,
        """
        G = 0

        def f(pairs):
            _scratch = 1
            a, b = pairs[0]
            captured = 3

            def inner():
                return captured

            for item in pairs:
                pass
            global G
            G = 7
            return inner
        """,
    )
    assert out == []


def test_detects_percent_format_arity(tmp_path):
    out = _check(tmp_path, 'x = 1\nprint("%s and %s" % (x,))\n')
    assert any("%-format string expects 2 argument(s), tuple has 1" in m for m in out)
    # %% and matched arity are fine; mapped conversions are not countable.
    ok = _check(
        tmp_path,
        'x = 1\nprint("100%% of %s" % (x,))\nprint("%(k)s" % {"k": x})\n',
        name="ok.py",
    )
    assert ok == []


def test_detects_str_format_arity(tmp_path):
    out = _check(tmp_path, 'print("{} vs {}".format(1))\n')
    assert any(".format() uses 2 positional placeholder(s) but is given 1" in m for m in out)
    ok = _check(tmp_path, 'print("{0} vs {0}".format(1))\n', name="ok.py")
    assert ok == []


def test_detects_placeholderless_fstring_not_format_specs(tmp_path):
    out = _check(tmp_path, 'x = 5\ny = f"no placeholder here"\nprint(x, y)\n')
    assert any("f-string without any placeholders" in m for m in out)
    # a format SPEC is itself a JoinedStr in the AST and must not flag
    ok = _check(tmp_path, 'x = 5\nprint(f"{x:4d} ok")\n', name="ok.py")
    assert ok == []


def test_shadowed_builtin_ignores_load_context_in_targets(tmp_path):
    # `table[len(xs)] = 1` mentions `len` in Load context inside the
    # assignment TARGET; only Store bindings may flag (review finding).
    out = _check(
        tmp_path,
        """
        table = {}
        xs = [1]
        table[len(xs)] = 1
        registry = {}
        registry[dict] = "handler"
        print(table, registry)
        """,
    )
    assert out == []


def test_detects_call_arity_too_many(tmp_path):
    out = _check(
        tmp_path,
        """
        def f(a, b=1):
            return a + b
        f(1, 2, 3)
        """,
    )
    assert any("passes 3 positional argument(s), it accepts at most 2" in m for m in out)


def test_detects_call_arity_missing_and_unknown_kw(tmp_path):
    out = _check(
        tmp_path,
        """
        def f(a, b, c=1):
            return a + b + c
        f(1)
        f(1, 2, d=3)
        """,
    )
    assert any("missing required argument(s)" in m for m in out)
    assert any("unknown keyword(s) ['d']" in m for m in out)


def test_call_arity_exemptions(tmp_path):
    # decorators, *args defs, starred calls, rebound names, and
    # keyword-filled positionals are all exempt or satisfied.
    out = _check(
        tmp_path,
        """
        import functools

        def ok(a, b=2, *, c=3):
            return a + b + c

        @functools.lru_cache
        def deco(a):
            return a

        def var(*args):
            return args

        ok(1)
        ok(1, 2, c=4)
        ok(1, b=5)
        deco(1, 2)          # decorated: unknown wrapper signature
        var(1, 2, 3, 4)
        args = (1, 2)
        ok(*args)
        rebound = ok
        def maybe(a):
            return a
        maybe = var         # rebound -> dropped from the table
        maybe(1, 2, 3)
        print(rebound)
        """,
    )
    assert out == []


def test_call_arity_scope_aware(tmp_path):
    # A parameter or local binding shadowing a module-level function must
    # suppress the check in that scope (review finding).
    out = _check(
        tmp_path,
        """
        def handler(a, b):
            return a + b

        def g(handler):
            return handler(1)

        def h():
            def handler(a):
                return a
            return handler(1)

        print(handler(1, 2), g(len), h())
        """,
    )
    assert out == []


def test_call_arity_conditional_rebind_exempt(tmp_path):
    # `try: from fast_impl import f` fallback rebinds f inside a block —
    # the rebinding scan must descend into blocks (review finding).
    out = _check(
        tmp_path,
        """
        def f(a, b):
            return a + b

        try:
            from fast_impl import f  # noqa - optional accelerator
        except ImportError:
            pass
        print(f(1))
        """,
    )
    assert not any("call to 'f'" in m for m in out)


def test_call_arity_exact_binding_rules(tmp_path):
    # Keyword-only args do not fill positional slots, and a keyword
    # naming an already-filled positional is a 'multiple values' error
    # (review finding: both previously passed clean).
    out = _check(
        tmp_path,
        """
        def f(a, b, *, c=1):
            return a + b + c

        def g(a, b):
            return a + b

        f(1, c=2)
        g(1, 2, a=3)
        """,
    )
    assert any("call to 'f' is missing required argument(s) ['b']" in m for m in out)
    assert any("call to 'g' passes ['a'] both positionally and by keyword" in m for m in out)


def test_call_arity_scope_engine_hardening(tmp_path):
    """Third-review repros: class-body shadowing, global rebinds,
    module-level walrus rebinds, comprehension targets, and deep
    expression trees must neither false-positive nor crash."""
    out = _check(
        tmp_path,
        """
        import os

        def f(a, b):
            return a + b

        class C:
            def f(a):
                return a
            y = f(1)            # class-body call resolves to C's f

        def setup():
            global g
            def g(a):
                return a

        def g(a, b):
            return a + b
        setup()
        g(1)                    # g was global-rebound: exempt

        def h(a, b):
            return a + b
        if (h := getattr(os, "getcwd", None)):
            pass
        h()                     # h rebound by module-level walrus: exempt

        def k(a, b):
            return a + b
        results = [k(3) for k in [abs, int]]   # comprehension target shadows
        print(C, results, f(1, 2))
        """,
    )
    assert out == []
    # Deep expression tree: must not RecursionError the gate.
    deep = "x = " + " + ".join(["1"] * 3000) + "\nprint(x)\n"
    out2 = _check(tmp_path, deep, name="deep.py")
    assert out2 == []
