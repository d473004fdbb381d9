"""Notebook examples (examples/notebooks/) are generated + executed by
tools/gen_notebooks.py; committed notebooks must match the generator's
cell sources (the review gate — outputs may drift, sources may not) and
carry real executed outputs."""

import importlib.util
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load_generator():
    spec = importlib.util.spec_from_file_location(
        "gen_notebooks", ROOT / "tools" / "gen_notebooks.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_notebooks_match_generator_sources():
    import nbformat

    gen = _load_generator()
    for name, cells in gen.NOTEBOOKS.items():
        path = ROOT / "examples" / "notebooks" / name
        assert path.exists(), f"{name} not built — run tools/gen_notebooks.py"
        nb = nbformat.read(path, as_version=4)
        got = [(
            "md" if c.cell_type == "markdown" else "code", c.source
        ) for c in nb.cells]
        want = [(k, s.rstrip("\n")) for k, s in cells]
        got = [(k, s.rstrip("\n")) for k, s in got]
        assert got == want, f"{name} cells drifted from tools/gen_notebooks.py"


def test_notebooks_carry_executed_outputs():
    """Committed notebooks are EXECUTED (reference notebooks ship with
    outputs too): every code cell has an execution_count and no cell
    output is an error."""
    import nbformat

    gen = _load_generator()
    for name in gen.NOTEBOOKS:
        nb = nbformat.read(
            ROOT / "examples" / "notebooks" / name, as_version=4
        )
        code_cells = [c for c in nb.cells if c.cell_type == "code"]
        assert code_cells
        for c in code_cells:
            assert c.execution_count is not None, f"{name}: unexecuted cell"
            for out in c.outputs:
                assert out.output_type != "error", (
                    f"{name}: error output {out.get('ename')}"
                )
