"""Input preparation: validation, null-dropping, key derivation, sha256
(SURVEY.md §2.2 M1-M3; reference ``R/fuzzylink.R:48-70``).

The ``input_hint`` corpus schema is ``(repo, path, commit, lang, content)``;
:func:`prepare_corpus` derives the fuzzy key (filename stem of ``path``) and
the per-row ``content_sha256`` invariant column. All transforms are
vectorized Arrow ``map_batches``; validation errors surface before execution
via ``Dataset.schema()`` (no full pass needed).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]
BLOCK_SEP = "\x1f"  # joins multi-column blocking values into one block key


def validate_by(ds: ray.data.Dataset, by: str, name: str) -> None:
    """M1 (R/fuzzylink.R:48-53): error when the ``by`` column is absent."""
    names = ds.schema().names
    if by not in names:
        raise ValueError(f"There is no variable called '{by}' in {name}.")


def drop_missing(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """M2 (R/fuzzylink.R:61-70): drop rows with nulls in key/blocking cols.

    The reference counts and warns; the count here is available from
    ``Dataset.stats()`` row deltas rather than a dedicated extra pass."""

    def _drop(batch: pa.Table) -> pa.Table:
        mask = None
        for c in cols:
            valid = pc.is_valid(batch.column(c))
            mask = valid if mask is None else pc.and_(mask, valid)
        if mask is None:
            return batch
        return batch.filter(mask)

    return ds.map_batches(_drop, batch_format="pyarrow")


def _stem_from_path(path: str) -> str:
    base = path.rsplit("/", 1)[-1]
    dot = base.rfind(".")
    return base[:dot] if dot > 0 else base


def add_key_from_path(batch: pa.Table) -> pa.Table:
    """Derived fuzzy key = filename stem of ``path`` (the configurable
    projection named in SURVEY.md §1.3 for the corpus schema). Vectorized
    regex kernels (strip directory, strip final extension)."""
    base = pc.replace_substring_regex(batch.column("path"), r"^.*/", "")
    stem = pc.replace_substring_regex(base, r"\.[^./]*$", "")
    # keep dotfiles ('.gitignore' → '.gitignore', not '') like the scalar rule
    stem = pc.if_else(pc.equal(stem, ""), base, stem)
    return batch.append_column("key", pc.cast(stem, pa.string()))


def add_content_sha256(batch: pa.Table) -> pa.Table:
    contents = batch.column("content").to_pylist()
    hashes = pa.array(
        [hashlib.sha256(c.encode()).hexdigest() for c in contents],
        type=pa.string(),
    )
    return batch.append_column("content_sha256", hashes)


def prepare_corpus(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Corpus-table preparation: derive ``key`` + ``content_sha256``."""

    def _prep(batch: pa.Table) -> pa.Table:
        return add_content_sha256(add_key_from_path(batch))

    return ds.map_batches(_prep, batch_format="pyarrow")


def add_block_key(ds: ray.data.Dataset, blocking: list[str] | None) -> ray.data.Dataset:
    """Append a single string ``block`` column: the ``BLOCK_SEP``-joined
    blocking values, or the constant "1" when not blocking (the reference's
    ``blocks <- data.frame(block = 1)``, R/fuzzylink.R:89)."""

    if not blocking:
        return ds.map_batches(
            lambda t: t.append_column(
                "block", pa.array(["1"] * len(t), type=pa.string())
            ),
            batch_format="pyarrow",
        )

    def _bk(batch: pa.Table) -> pa.Table:
        if len(blocking) == 1:
            bk = pc.cast(batch.column(blocking[0]), pa.string())
        else:
            cols = [pc.cast(batch.column(c), pa.string()) for c in blocking]
            bk = pc.binary_join_element_wise(*cols, BLOCK_SEP)
        return batch.append_column("block", bk)

    return ds.map_batches(_bk, batch_format="pyarrow")
