"""Generate markdown API docs from the package's docstrings.

Counterpart of the reference's Sphinx autodoc pipeline
(reference: docs/conf.py:23-27 + docs/*.rst, published as a docs site):
this environment has no Sphinx, so the generator is stdlib-only
(``inspect`` + ``importlib``) and emits one markdown page per module
under ``docs/api/`` plus an index.  Output is deterministic (no
timestamps, members sorted by source position) so the test suite can
assert the committed pages match the docstrings they were generated
from (tests/test_api_docs.py) — the drift the handwritten docs could
never detect.

Usage::

    python tools/gen_api_docs.py [--out docs/api] [--check]

``--check`` exits nonzero if the committed pages differ from what would
be generated (the CI-style sync gate).
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import sys
from pathlib import Path

# Runnable from a checkout without installation: `python tools/gen_api_docs.py`
# puts tools/ (not the repo root) on sys.path.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: Modules documented, in index order.  Private helpers (leading
#: underscore) are skipped per-member; modules absent here are internal.
MODULES = [
    "zfista_tpu",
    "zfista_tpu.core.solver",
    "zfista_tpu.core.options",
    "zfista_tpu.core.result",
    "zfista_tpu.core.subproblem",
    "zfista_tpu.models.base",
    "zfista_tpu.models.zoo",
    "zfista_tpu.models.lasso",
    "zfista_tpu.models.logistic",
    "zfista_tpu.models.deblur",
    "zfista_tpu.metrics",
    "zfista_tpu.parallel.batch",
    "zfista_tpu.parallel.sharding",
    "zfista_tpu.parallel.distributed",
    "zfista_tpu.ops.prox",
    "zfista_tpu.ops.tv",
    "zfista_tpu.ops.tv_pallas",
    "zfista_tpu.ops.fused",
    "zfista_tpu.ops.precision",
    "zfista_tpu.utils.checkpoint",
    "zfista_tpu.utils.profiling",
    "zfista_tpu.utils.platform",
    "zfista_tpu.bench.harness",
    "zfista_tpu.bench.momentum_sweep",
    "zfista_tpu.bench.gap_bench",
    "zfista_tpu.bench.restart_bench",
    "zfista_tpu.bench.tv_bench",
    "zfista_tpu.bench.scaling",
    "zfista_tpu.bench.kernels",
    "zfista_tpu.bench.plots",
]


def _unwrap(obj):
    """Peel decorator wrappers (functools.wraps chains, jax.jit) so
    ``inspect.signature``/``getsourcelines`` see the original."""
    seen = set()
    while hasattr(obj, "__wrapped__") and id(obj) not in seen:
        seen.add(id(obj))
        obj = obj.__wrapped__
    return obj


def _source_line(obj) -> int:
    try:
        return inspect.getsourcelines(_unwrap(obj))[1]
    except (OSError, TypeError):
        return 1 << 30


def _signature(name: str, obj) -> str:
    try:
        sig = inspect.signature(obj)
    except (ValueError, TypeError):
        return name
    text = f"{name}{sig}"
    if len(text) <= 88:
        return text
    # one parameter per line for long signatures
    params = list(sig.parameters.values())
    body = ",\n    ".join(str(p) for p in params)
    ret = (
        f" -> {inspect.formatannotation(sig.return_annotation)}"
        if sig.return_annotation is not inspect.Signature.empty
        else ""
    )
    return f"{name}(\n    {body},\n){ret}"


def _doc_block(obj) -> str:
    doc = inspect.getdoc(obj)
    return doc.strip() + "\n" if doc else "*(undocumented)*\n"


def _members(mod):
    """Public functions/classes DEFINED in this module (re-exports are
    documented where they are defined; the package page lists them)."""
    out = []
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if not (inspect.isfunction(_unwrap(obj)) or inspect.isclass(obj)):
            continue
        defined_in = getattr(_unwrap(obj), "__module__", None)
        if defined_in != mod.__name__:
            continue
        out.append((name, obj))
    out.sort(key=lambda kv: (_source_line(kv[1]), kv[0]))
    return out


def _class_methods(cls):
    out = []
    for name, obj in vars(cls).items():
        if name.startswith("_") and name != "__init__":
            continue
        func = _unwrap(obj)
        if isinstance(obj, (staticmethod, classmethod)):
            func = _unwrap(obj.__func__)
        if not inspect.isfunction(func):
            continue
        out.append((name, func))
    out.sort(key=lambda kv: (_source_line(kv[1]), kv[0]))
    return out


def render_module(dotted: str) -> str:
    mod = importlib.import_module(dotted)
    lines = [f"# `{dotted}`", ""]
    lines.append(_doc_block(mod))
    members = _members(mod)
    if dotted == "zfista_tpu":
        # the package page documents its re-export surface
        exported = sorted(getattr(mod, "__all__", []))
        if exported:
            lines.append("## Public re-exports")
            lines.append("")
            for name in exported:
                obj = getattr(mod, name)
                home = getattr(_unwrap(obj), "__module__", "?")
                lines.append(f"- `{name}` — defined in [`{home}`]({home}.md)")
            lines.append("")
    for name, obj in members:
        if inspect.isclass(obj):
            lines.append(f"## class `{name}`")
            lines.append("")
            lines.append("```python")
            lines.append(_signature(name, obj))
            lines.append("```")
            lines.append("")
            lines.append(_doc_block(obj))
            for mname, meth in _class_methods(obj):
                label = name if mname == "__init__" else f"{name}.{mname}"
                if mname == "__init__":
                    continue  # constructor signature shown on the class
                lines.append(f"### `{label}`")
                lines.append("")
                lines.append("```python")
                lines.append(_signature(mname, meth))
                lines.append("```")
                lines.append("")
                lines.append(_doc_block(meth))
        else:
            lines.append(f"## `{name}`")
            lines.append("")
            lines.append("```python")
            lines.append(_signature(name, obj))
            lines.append("```")
            lines.append("")
            lines.append(_doc_block(obj))
    return "\n".join(lines).rstrip() + "\n"


def render_index() -> str:
    lines = [
        "# API reference (generated)",
        "",
        "Generated from docstrings by `tools/gen_api_docs.py` — do not",
        "edit by hand; re-run the generator after changing a docstring",
        "(tests/test_api_docs.py fails on drift).  Narrative docs live in",
        "[docs/](../README.md).",
        "",
    ]
    for dotted in MODULES:
        mod = importlib.import_module(dotted)
        doc = inspect.getdoc(mod)
        hook = (doc or "").strip().splitlines()[0] if doc else ""
        lines.append(f"- [`{dotted}`]({dotted}.md) — {hook}")
    return "\n".join(lines) + "\n"


def generate() -> dict[str, str]:
    pages = {"README.md": render_index()}
    for dotted in MODULES:
        pages[f"{dotted}.md"] = render_module(dotted)
    return pages


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="docs/api")
    parser.add_argument("--check", action="store_true")
    args = parser.parse_args(argv)
    out = Path(args.out)
    pages = generate()
    if args.check:
        stale = []
        for name, text in pages.items():
            p = out / name
            if not p.exists() or p.read_text() != text:
                stale.append(name)
        extra = sorted(
            p.name for p in out.glob("*.md") if p.name not in pages
        )
        if stale or extra:
            print(f"API docs out of sync: stale={stale} orphaned={extra}")
            return 1
        print(f"API docs in sync ({len(pages)} pages)")
        return 0
    out.mkdir(parents=True, exist_ok=True)
    for name, text in pages.items():
        (out / name).write_text(text)
    for p in out.glob("*.md"):
        if p.name not in pages:
            p.unlink()  # module removed -> page removed
    print(f"wrote {len(pages)} pages to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
