"""Module hygiene: no operator module may assign the same module-level
ALL_CAPS constant twice. Oracle SQL strings bake constants at decoration
time but Spark function bodies read module globals at CALL time, so a
later re-assignment silently desynchronizes every earlier op that used
the name (round-5 incident: a second PMI_TOPK at the bottom of textops.py
flipped text_pmi_pairs' LIMIT from 50 to 20 while its oracle kept 50)."""

from __future__ import annotations

import ast
import glob
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "repcheck_data_integration_spark",
)


def _toplevel_constant_assignments(path: str) -> dict[str, int]:
    tree = ast.parse(open(path).read())
    seen: dict[str, int] = {}
    for node in tree.body:
        targets = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            targets = [node.target]
        for t in targets:
            if isinstance(t, ast.Name) and t.id.isupper():
                seen[t.id] = seen.get(t.id, 0) + 1
    return seen


def test_no_duplicate_module_constants():
    offenders = []
    for path in glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True):
        for name, n in _toplevel_constant_assignments(path).items():
            if n > 1:
                offenders.append(f"{os.path.relpath(path, PKG)}:{name} x{n}")
    assert not offenders, (
        "module-level constants assigned more than once (later assignment"
        " shadows every earlier op's call-time read): " + ", ".join(offenders)
    )
