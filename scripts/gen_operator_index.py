"""Generate OPERATORS.md — the gate-name → implementation → oracle index.

Derived statically (ast) from __ray_entry__.py so it cannot drift from
the actual contract: every `queries()` key, the raylink symbols its gate
function imports (the operator under test), and whether a bit-exact
DuckDB oracle exists for it. `tests/test_contract_counts.py` re-runs
this generator and asserts the committed file matches.

Usage: python scripts/gen_operator_index.py [--check]
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _dict_items(tree: ast.Module, fname: str) -> dict[str, str]:
    """gate name -> the callable's function name (queries) / '' (oracle)."""
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == fname:
            for n in ast.walk(node):
                if isinstance(n, ast.Return) and isinstance(n.value, ast.Dict):
                    out = {}
                    for k, v in zip(n.value.keys, n.value.values):
                        name = v.id if isinstance(v, ast.Name) else ""
                        out[k.value] = name
                    return out
    raise SystemExit(f"no dict-returning {fname}() found")


def _imports_of(tree: ast.Module) -> dict[str, list[str]]:
    """function name -> raylink symbols imported inside it."""
    out: dict[str, list[str]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef):
            syms: list[str] = []
            for n in ast.walk(node):
                if isinstance(n, ast.ImportFrom) and n.module and (
                    n.module == "raylink" or n.module.startswith("raylink.")
                ):
                    mod = n.module.removeprefix("raylink.").replace(
                        "raylink", ""
                    )
                    for a in n.names:
                        syms.append(
                            f"{mod}.{a.name}" if mod else a.name
                        )
            out[node.name] = syms
    return out


def generate() -> str:
    src = (ROOT / "__ray_entry__.py").read_text()
    tree = ast.parse(src)
    queries = _dict_items(tree, "queries")
    oracles = set(_dict_items(tree, "oracle_sql"))
    imports = _imports_of(tree)

    lines = [
        "# Operator index (generated — do not edit)",
        "",
        "Regenerate with `python scripts/gen_operator_index.py`;",
        "`tests/test_contract_counts.py` asserts this file is current.",
        "",
        f"{len(queries)} `queries()` gates, {len(oracles)} with a "
        "bit-exact DuckDB oracle (`SQL`); the rest are rows-only "
        "(binary codec output SQL cannot express).",
        "",
        "| gate | exercises (raylink imports in the gate fn) | oracle |",
        "|---|---|---|",
    ]
    for gate, fn in queries.items():
        syms = imports.get(fn, [])
        shown = ", ".join(f"`{s}`" for s in syms[:4]) or "(driver-side composition)"
        if len(syms) > 4:
            shown += f" +{len(syms) - 4}"
        lines.append(
            f"| `{gate}` | {shown} | "
            f"{'SQL' if gate in oracles else 'rows-only'} |"
        )
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    text = generate()
    target = ROOT / "OPERATORS.md"
    if "--check" in sys.argv:
        if target.read_text() != text:
            raise SystemExit("OPERATORS.md is stale — regenerate")
        print("OPERATORS.md current")
        return
    target.write_text(text)
    print(f"wrote {target} ({text.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
