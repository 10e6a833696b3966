"""Pair-labeling oracle (SURVEY.md §2.3 T2; reference ``R/check_match.R``).

The reference sends record pairs to an LLM ("Decide if the following two
names refer to the same {record_type} ... Respond with 'Yes' or 'No'",
``R/check_match.R:50-54,135``) across five provider branches, normalizing
replies to canonical 'Yes'/'No' (first word, title case,
``R/check_match.R:141``) and short-circuiting exact string matches to 'Yes'
without an API call (``R/check_match.R:59-63``).

Here the oracle is a pluggable protocol: the sandbox ships a deterministic
ground-truth oracle (lookup in the fixture's labeled-pairs table; unseen →
'No') — the production seam for an HTTP LLM client is the same ``label()``
batch interface. Oracle calls happen on driver-selected small batches (≤500
initial, ≤100 per loop iteration — bounded by ``max_labels``), so they run
as plain driver-side batch calls, exactly like the reference's control flow
(SURVEY.md §3.1); an actor-pool deployment is only needed for a slow remote
backend.

A label journal makes repeated calls idempotent so a resumed run never
re-spends label budget (SURVEY.md §4 checkpoint row).
"""

from __future__ import annotations

import re
from typing import Protocol


def render_prompt(a: str, b: str, record_type: str = "entity", instructions: str | None = None) -> str:
    """Prompt template parity with ``R/check_match.R:50-54``."""
    extra = f" {instructions}" if instructions else ""
    return (
        f"Decide if the following two names refer to the same {record_type}."
        f"{extra}\nName A: {a}\nName B: {b}\nAnswer 'Yes' or 'No':"
    )


def normalize_label(raw: str) -> str | None:
    """First word, title-cased (``R/check_match.R:141``); anything that does
    not normalize to Yes/No is returned as-is title-cased (the reference
    stores whatever came back)."""
    m = re.match(r"\w+", raw.strip())
    if not m:
        return None
    return m.group(0).title()


class Oracle(Protocol):
    def label(self, pairs: list[tuple[str, str]]) -> list[str]: ...


class DeterministicOracle:
    """Ground-truth oracle from a ``(key_a, key_b) -> 'Yes'/'No'`` dict.

    * exact string equality short-circuits to 'Yes' (R/check_match.R:59-63)
    * unseen pairs → 'No'
    * ``calls`` / ``labels_spent`` track budget usage; the journal caches
      every answered pair so retried/resumed calls are free and idempotent.
    """

    def __init__(self, labels: dict[tuple[str, str], str]):
        self._labels = labels
        self.journal: dict[tuple[str, str], str] = {}
        self.calls = 0
        self.labels_spent = 0

    def label(self, pairs: list[tuple[str, str]]) -> list[str]:
        self.calls += 1
        out = []
        for a, b in pairs:
            key = (a, b)
            if key in self.journal:
                out.append(self.journal[key])
                continue
            if a == b:
                ans = "Yes"
            else:
                ans = self._labels.get(key) or self._labels.get((b, a)) or "No"
            ans = normalize_label(ans) or "No"
            self.journal[key] = ans
            self.labels_spent += 1
            out.append(ans)
        return out


class CallableOracle:
    """Adapter wrapping any ``fn(a, b) -> str`` (e.g. an HTTP LLM client)
    with prompt rendering, normalization and the exact-match short circuit."""

    def __init__(self, fn, record_type: str = "entity", instructions: str | None = None):
        self.fn = fn
        self.record_type = record_type
        self.instructions = instructions
        self.journal: dict[tuple[str, str], str] = {}
        self.calls = 0
        self.labels_spent = 0

    def label(self, pairs: list[tuple[str, str]]) -> list[str]:
        self.calls += 1
        out = []
        for a, b in pairs:
            key = (a, b)
            if key in self.journal:
                out.append(self.journal[key])
                continue
            if a == b:
                ans = "Yes"
            else:
                raw = self.fn(render_prompt(a, b, self.record_type, self.instructions))
                ans = normalize_label(raw) or "No"
            self.journal[key] = ans
            self.labels_spent += 1
            out.append(ans)
        return out


def check_match(strings_a, strings_b, oracle: Oracle) -> list[str]:
    """Vector interface parity with ``check_match()``
    (``R/check_match.R:21-31``): equal-length string vectors in, aligned
    'Yes'/'No' labels out."""
    if len(strings_a) != len(strings_b):
        raise ValueError("strings_a and strings_b must be the same length")
    return oracle.label(list(zip([str(s) for s in strings_a], [str(s) for s in strings_b])))
