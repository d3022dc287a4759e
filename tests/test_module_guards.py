"""Structural guards against the constant-shadowing bug class.

Round-3 regression `s_shard_assignment` happened because
`plans/sampling.py` assigned the module-level constant `_N_SHARDS`
twice (16 at the top, 8 further down): oracle SQL strings interpolate
such constants at import time (f-strings in the decorator call) while
the Spark function bodies read them at call time, so a later rebind
silently desynchronizes a query from its own oracle.  This test makes
that class impossible: no module in `plans/` or `operators/` may
assign the same module-level NAME twice (augmented assignment and
conditional try/except fallbacks excepted — those are single logical
definitions)."""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / "finance_etl_pipeline_spark"
# plans/ and operators/ are where oracle SQL bakes constants, but the
# bug class (module constant rebound after import-time interpolation)
# is not dir-specific — scan the whole package
SCAN_DIRS = [PKG] + [p for p in PKG.iterdir() if p.is_dir() and p.name != "__pycache__"]


def _module_level_assignments(tree: ast.Module) -> dict[str, list[int]]:
    """Map name -> line numbers of top-level simple assignments.

    Only plain `NAME = ...` / `NAME: T = ...` statements at module
    scope count; `if/try` branches (conditional fallbacks like
    `try: import x` / `HAVE_X = True`) are deliberately ignored
    because their branches are mutually exclusive definitions.
    """
    seen: dict[str, list[int]] = {}
    for node in tree.body:
        targets: list[ast.expr] = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            targets = [node.target]
        for t in targets:
            if isinstance(t, ast.Name):
                seen.setdefault(t.id, []).append(node.lineno)
            elif isinstance(t, (ast.Tuple, ast.List)):
                for el in t.elts:
                    if isinstance(el, ast.Name):
                        seen.setdefault(el.id, []).append(node.lineno)
    return seen


def test_no_module_level_constant_is_assigned_twice():
    offenders: list[str] = []
    for d in SCAN_DIRS:
        for py in sorted(d.glob("*.py")):
            tree = ast.parse(py.read_text(), filename=str(py))
            for name, lines in _module_level_assignments(tree).items():
                if len(lines) > 1 and name != "__all__":
                    offenders.append(
                        f"{py.relative_to(PKG.parent)}: {name} assigned at "
                        f"lines {lines} — rename the later one; oracle SQL "
                        f"baked the first value at import time"
                    )
    assert not offenders, "\n".join(offenders)
