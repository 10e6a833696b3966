"""Deterministic synthetic fixtures (FIXTURES.md F1-F4; no external data).

Mirrors the reference's de-facto test corpus (SURVEY.md §5): the README
presidents golden example (``/root/reference/README.md:163-292``), the
fastLink-style voters replication shape (``data-raw/my_pkg_data.R:7-41``),
and — primarily — the ``input_hint`` source-code-repository table
``(repo, path, commit, lang, content)`` with fuzzy-key variants of
ground-truth entities, blocked by ``lang``, with a Zipf-skewed hot block.

Everything is seeded (numpy PCG64) and byte-identical across runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LANGS = ["py", "c", "cpp", "js", "java", "go", "rs", "rb"]
LANG_P = np.array([0.45, 0.15, 0.10, 0.08, 0.07, 0.06, 0.05, 0.04])
LANG_EXT = {
    "py": "py", "c": "c", "cpp": "cc", "js": "js",
    "java": "java", "go": "go", "rs": "rs", "rb": "rb",
}

_ADJ = [
    "string", "file", "json", "http", "user", "auth", "cache", "log", "net",
    "db", "geo", "time", "config", "event", "task", "queue", "graph", "tree",
    "hash", "byte", "char", "text", "data", "form", "mail", "path", "disk",
    "sync", "proc", "thread", "socket", "stream", "token", "session", "image",
    "audio", "video", "proto", "schema", "index", "query", "batch", "shard",
    "block", "chunk", "page", "row", "column", "field", "record", "metric",
    "trace", "span", "error", "retry", "rate", "limit", "quota", "policy",
    "rule",
]
# noun pool constraint: pairwise consonant-skeleton OSA distance ≥ 2, so a
# vowel-stripping abbreviation of one noun can never be confused with
# another noun's abbreviation (parser/porter → prsr/prtr style ambiguity is
# unresolvable for any model — and for the reference's LLM oracle user too)
_NOUN = [
    "utils", "reader", "writer", "builder", "handler", "service", "codec",
    "filter", "mapper", "merger", "splitter", "scanner", "printer", "runner",
    "driver", "engine", "broker", "pool", "factory", "registry", "adapter",
    "bridge", "proxy", "tracker", "checker", "cleaner", "fetcher", "sender",
    "receiver", "encoder", "decoder", "packer", "walker", "visitor",
    "emitter", "resolver", "planner", "executor", "sampler", "counter",
    "timer", "logger", "guard", "wrapper", "context", "buffer", "cursor",
    "iterator", "channel", "inspector", "validator", "formatter",
    "compressor", "notifier", "dispatcher", "aggregator", "scheduler",
    "collector", "analyzer", "generator", "extractor", "publisher",
    "subscriber", "archiver", "balancer", "throttler", "indexer",
]
_SYNONYM = {
    "utils": "helpers", "helpers": "utils", "manager": "mgr",
    "handler": "hdlr", "service": "svc", "config": "cfg",
    "builder": "bldr", "counter": "cntr", "buffer": "buf",
    "logger": "logr", "context": "ctx",
}
_CODE_WORDS = [
    "def", "return", "import", "class", "self", "value", "result", "items",
    "for", "in", "if", "else", "None", "True", "False", "raise", "try",
    "except", "with", "open", "read", "write", "close", "len", "range",
    "append", "dict", "list", "set", "str", "int", "float", "print", "assert",
    "lambda", "yield", "while", "break", "continue", "pass", "global", "not",
    "and", "or", "is", "from", "as", "del", "format", "join", "split",
]


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _commit_hex(repo: str, path: str, seed: int) -> str:
    return hashlib.blake2b(
        f"{repo}|{path}|{seed}".encode(), digest_size=20
    ).hexdigest()


def _make_content(rng: np.random.Generator, eid: int) -> str:
    n_lines = int(rng.integers(8, 80))
    lines = [f"# entity {eid:08d}"]
    for _ in range(n_lines):
        k = int(rng.integers(3, 9))
        words = rng.choice(_CODE_WORDS, size=k)
        indent = "    " * int(rng.integers(0, 3))
        lines.append(indent + " ".join(words))
    return "\n".join(lines)


def _typo(rng: np.random.Generator, s: str) -> str:
    if len(s) < 4:
        return s
    ops = 1  # single-edit typos: the method's published operating envelope
    chars = list(s)
    for _ in range(ops):
        i = int(rng.integers(1, len(chars) - 1))
        op = int(rng.integers(0, 3))
        if op == 0 and len(chars) > 4:  # delete
            del chars[i]
        elif op == 1:  # swap
            chars[i - 1], chars[i] = chars[i], chars[i - 1]
        else:  # substitute
            chars[i] = chr(ord("a") + int(rng.integers(0, 26)))
    return "".join(chars)


def _variant(rng: np.random.Generator, stem: str) -> str:
    """One seeded fuzzy-key perturbation of a snake_case stem
    (FIXTURES.md F1: abbreviation / synonym / case-separator / typo /
    prefix-suffix, mirroring the README name variants)."""
    toks = stem.split("_")
    r = rng.random()
    if r < 0.25:  # exact
        return stem
    if r < 0.45:  # case/separator change
        style = int(rng.integers(0, 3))
        if style == 0:  # camelCase
            return toks[0] + "".join(t.capitalize() for t in toks[1:])
        if style == 1:  # kebab-case
            return "-".join(toks)
        return "".join(t.capitalize() for t in toks)  # PascalCase
    if r < 0.60:  # abbreviation: strip vowels from the noun token (an
        # adjective abbreviation can collide with another adjective —
        # auth→ath vs path — which no model can resolve)
        t = toks[-1]
        ab = t[0] + "".join(c for c in t[1:] if c not in "aeiou")
        toks = toks[:-1] + [ab if len(ab) >= 2 else t]
        return "_".join(toks)
    if r < 0.75:  # synonym swap on last token
        last = toks[-1]
        if last in _SYNONYM:
            return "_".join(toks[:-1] + [_SYNONYM[last]])
        return "_".join(toks)
    if r < 0.90:  # typo, confined to the noun token: adjective pool members
        # can sit 2 edits apart, so an adjective typo could land exactly
        # between two entities (auth→ath←path) — unresolvable by any model
        fixed, noun = stem.rsplit("_", 1) if "_" in stem else ("", stem)
        noun = _typo(rng, noun)
        return f"{fixed}_{noun}" if fixed else noun
    # prefix/suffix
    return ("test_" + stem) if rng.random() < 0.5 else (stem + "_v2")


def make_corpus(
    n_entities: int = 400,
    seed: int = 42,
    both_sides_frac: float = 0.7,
    hot_block: bool = True,
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Generate ``(corpus_a, corpus_b, truth_pairs)``.

    * ``corpus_a`` / ``corpus_b`` — the ``input_hint`` schema
      ``(repo, path, commit, lang, content)``.
    * ``truth_pairs`` — string-level ground truth
      ``(key_a, key_b, lang, label)``: every distinct within-``lang``
      cross-side key pair whose originating entity sets intersect is 'Yes';
      seeded lexically-close hard negatives are 'No'. Backs the
      deterministic oracle (replacing the LLM of ``R/check_match.R``) and
      pairwise-F1 evaluation at the fixed blocking key.
    """
    rng = np.random.default_rng(seed)

    # entity stems: unique (lang, stem); sample stem combos w/o replacement
    n_combo = len(_ADJ) * len(_NOUN)
    reps = (n_entities // n_combo) + 1
    perm = rng.permutation(n_combo * reps)[: n_entities * 2]

    lang_p = LANG_P if hot_block else np.full(len(LANGS), 1.0 / len(LANGS))
    entities = []  # (eid, stem, lang)
    used: set[tuple[str, str]] = set()
    for pi in perm:
        if len(entities) >= n_entities:
            break
        c = int(pi) % n_combo
        ver = int(pi) // n_combo
        stem = f"{_ADJ[c // len(_NOUN)]}_{_NOUN[c % len(_NOUN)]}"
        if ver > 0:
            # 'fam' suffix cannot collide with the '_v2' variant affix
            stem = f"{stem}_fam{ver + 1}"
        lang = LANGS[int(rng.choice(len(LANGS), p=lang_p))]
        if (lang, stem) in used:
            continue
        used.add((lang, stem))
        entities.append((len(entities), stem, lang))

    # cross-lang same-stem decoys (~1%): same stem, different lang, distinct
    # entity — blocking must keep them apart (README Trump/state analogue)
    n_decoy = max(2, n_entities // 100)
    for d in range(n_decoy):
        src = entities[int(rng.integers(0, n_entities))]
        other = [l for l in LANGS if l != src[2]]
        lang = other[int(rng.integers(0, len(other)))]
        if (lang, src[1]) not in used:
            used.add((lang, src[1]))
            entities.append((len(entities), src[1], lang))

    rows_a: dict[str, list] = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
    rows_b: dict[str, list] = {k: [] for k in rows_a}
    # (lang, key_string) -> set of entity ids, per side
    keymap_a: dict[tuple[str, str], set[int]] = {}
    keymap_b: dict[tuple[str, str], set[int]] = {}

    for eid, stem, lang in entities:
        crng = np.random.default_rng(seed * 1_000_003 + eid)
        content = _make_content(crng, eid)
        repo = f"org_{int(crng.integers(0, 50)):03d}/{stem.replace('_', '-')}"
        ext = LANG_EXT[lang]
        r = crng.random()
        n_a = int(crng.integers(1, 3))
        n_b = 0 if r > both_sides_frac else int(crng.integers(1, 4))
        if n_b == 0 and r > both_sides_frac + (1 - both_sides_frac) / 2:
            n_a, n_b = 0, int(crng.integers(1, 3))  # B-only entities too
        for side, n, rows, keymap in (
            ("a", n_a, rows_a, keymap_a),
            ("b", n_b, rows_b, keymap_b),
        ):
            for m in range(n):
                # A-side mentions stay canonical (the reference README
                # shape: clean dfA, variant dfB) so truth pairs are one
                # perturbation from a canonical form — the method's envelope
                key = stem if side == "a" else _variant(crng, stem)
                path = f"src/{key}.{ext}"
                body = content if m == 0 else content + f"\n# mention {side}{m}"
                rows["repo"].append(repo)
                rows["path"].append(path)
                rows["commit"].append(_commit_hex(repo, path, seed + m))
                rows["lang"].append(lang)
                rows["content"].append(body)
                keymap.setdefault((lang, key), set()).add(eid)

    # ---- string-level truth at the fixed blocking key -------------------
    by_lang_a: dict[str, list[tuple[str, frozenset]]] = {}
    by_lang_b: dict[str, list[tuple[str, frozenset]]] = {}
    for (lang, key), eids in keymap_a.items():
        by_lang_a.setdefault(lang, []).append((key, frozenset(eids)))
    for (lang, key), eids in keymap_b.items():
        by_lang_b.setdefault(lang, []).append((key, frozenset(eids)))

    tp: dict[str, list] = {"key_a": [], "key_b": [], "lang": [], "label": []}
    for lang, a_keys in sorted(by_lang_a.items()):
        b_keys = by_lang_b.get(lang, [])
        b_by_eid: dict[int, list[str]] = {}
        for key_b, eids in b_keys:
            for e in eids:
                b_by_eid.setdefault(e, []).append(key_b)
        for key_a, eids_a in sorted(a_keys):
            pos = set()
            for e in eids_a:
                pos.update(b_by_eid.get(e, []))
            for key_b in sorted(pos):
                tp["key_a"].append(key_a)
                tp["key_b"].append(key_b)
                tp["lang"].append(lang)
                tp["label"].append("Yes")
            # seeded hard negatives: same-lang keys sharing the first token
            tok = key_a.split("_")[0].split("-")[0][:4].lower()
            negs = [
                kb for kb, eb in b_keys
                if kb.lower().startswith(tok) and kb not in pos
            ][:3]
            for key_b in negs:
                tp["key_a"].append(key_a)
                tp["key_b"].append(key_b)
                tp["lang"].append(lang)
                tp["label"].append("No")

    schema = pa.schema(
        [("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
         ("lang", pa.string()), ("content", pa.string())]
    )
    corpus_a = pa.table(rows_a, schema=schema)
    corpus_b = pa.table(rows_b, schema=schema)
    truth = pa.table(
        tp,
        schema=pa.schema(
            [("key_a", pa.string()), ("key_b", pa.string()),
             ("lang", pa.string()), ("label", pa.string())]
        ),
    )
    return corpus_a, corpus_b, truth


def truth_label_dict(truth: pa.Table) -> dict[tuple[str, str], str]:
    """(key_a, key_b) -> 'Yes'/'No' lookup for the deterministic oracle.

    'Yes' wins when the same string pair appears in multiple langs (the
    oracle, like the reference's LLM, sees only the two strings —
    ``R/check_match.R:21``)."""
    out: dict[tuple[str, str], str] = {}
    for key_a, key_b, label in zip(
        truth.column("key_a").to_pylist(),
        truth.column("key_b").to_pylist(),
        truth.column("label").to_pylist(),
    ):
        k = (key_a, key_b)
        if label == "Yes" or k not in out:
            out[k] = label
    return out


def corpus_from_documents(
    sf_dir: str,
    seed: int = 42,
    both_sides_frac: float = 0.7,
    replicate: int = 1,
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Build the input_hint corpus from the driver-provided ``documents``
    table: one ground-truth entity per document, ``lang`` as the blocking
    key, document text as the (never-mutated) ``content``, seeded fuzzy-key
    variants on the B side. Deterministic given (sf_dir contents, seed).

    ``replicate=r`` emits r copies of every document, copy k in blocking key
    ``{lang}{k}`` — scaling the corpus (and candidate-pair count) linearly
    in r with r× more blocks, the shape a bigger shard of a 10¹²-file corpus
    would have. Used by bench.py to make compute dominate fixed overheads.

    Returns (corpus_a, corpus_b, truth_pairs) with the same shapes as
    :func:`make_corpus`.
    """
    import pyarrow.parquet as pq

    docs0 = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    if replicate > 1:
        n0 = len(docs0)
        docs = pa.table(
            {
                "doc_id": pa.array(
                    [k * n0 + d for k in range(replicate) for d in docs0.column("doc_id").to_pylist()],
                    type=pa.int64(),
                ),
                "text": pa.array(docs0.column("text").to_pylist() * replicate),
                "lang": pa.array(
                    [f"{l}{k}" for k in range(replicate) for l in docs0.column("lang").to_pylist()]
                ),
                "source": pa.array(docs0.column("source").to_pylist() * replicate),
            }
        )
    else:
        docs = docs0
    n2 = len(_NOUN)
    n3 = len(_ADJ) * n2
    suffixes = ["core", "base", "lib", "main", "x", "io", "net", "sys", "api",
                "fs", "db", "ui", "rt", "cli", "srv", "hub", "kit", "lab",
                "pro", "dev"]

    rows_a: dict[str, list] = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
    rows_b: dict[str, list] = {k: [] for k in rows_a}
    keymap_a: dict[tuple[str, str], set[int]] = {}
    keymap_b: dict[tuple[str, str], set[int]] = {}

    for doc_id, text, lang, source in zip(
        docs.column("doc_id").to_pylist(),
        docs.column("text").to_pylist(),
        docs.column("lang").to_pylist(),
        docs.column("source").to_pylist(),
    ):
        crng = np.random.default_rng(seed * 1_000_003 + doc_id)
        c = doc_id % n3
        stem = f"{_ADJ[c // n2]}_{_NOUN[c % n2]}"
        ver = doc_id // n3
        if ver > 0:
            stem = f"{stem}_{suffixes[ver % len(suffixes)]}"
        repo = f"{source}/{stem.replace('_', '-')}"
        r = crng.random()
        n_a = 1
        n_b = 0 if r > both_sides_frac else int(crng.integers(1, 3))
        for side, n, rows, keymap in (
            ("a", n_a, rows_a, keymap_a),
            ("b", n_b, rows_b, keymap_b),
        ):
            for m in range(n):
                key = stem if side == "a" else _variant(crng, stem)
                path = f"src/{key}.txt"
                rows["repo"].append(repo)
                rows["path"].append(path)
                rows["commit"].append(_commit_hex(repo, path, seed + m))
                rows["lang"].append(lang)
                rows["content"].append(text if m == 0 else text + f"\n<!-- {side}{m} -->")
                keymap.setdefault((lang, key), set()).add(doc_id)

    tp: dict[str, list] = {"key_a": [], "key_b": [], "lang": [], "label": []}
    by_lang_b: dict[str, list[tuple[str, frozenset]]] = {}
    for (lang, key), eids in keymap_b.items():
        by_lang_b.setdefault(lang, []).append((key, frozenset(eids)))
    for (lang, key_a), eids_a in sorted(keymap_a.items()):
        b_keys = by_lang_b.get(lang, [])
        pos = sorted(
            kb for kb, eb in b_keys if eb & eids_a
        )
        for key_b in pos:
            tp["key_a"].append(key_a)
            tp["key_b"].append(key_b)
            tp["lang"].append(lang)
            tp["label"].append("Yes")

    schema = pa.schema(
        [("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
         ("lang", pa.string()), ("content", pa.string())]
    )
    return (
        pa.table(rows_a, schema=schema),
        pa.table(rows_b, schema=schema),
        pa.table(tp, schema=pa.schema(
            [("key_a", pa.string()), ("key_b", pa.string()),
             ("lang", pa.string()), ("label", pa.string())]
        )),
    )


# --------------------------------------------------------------------------
# F3: presidents golden example (verbatim from /root/reference/README.md)


def presidents_tables() -> tuple[pa.Table, pa.Table, dict[tuple[str, str], str]]:
    """The blocked README example (``README.md:236-292``) with its golden
    match labels as the oracle ground truth."""
    dfa = pa.table(
        {
            "name": ["Joe Biden", "Donald Trump", "Barack Obama",
                     "George W. Bush", "Bill Clinton"],
            "state": ["Delaware", "New York", "Illinois", "Texas", "Arkansas"],
            "age": [81, 77, 62, 77, 77],
        }
    )
    dfb = pa.table(
        {
            "name": ["Joseph Robinette Biden", "Donald John Trump ",
                     "Barack Hussein Obama", "George Walker Bush",
                     "William Jefferson Clinton", "George Herbert Walker Bush",
                     "Biff Tannen", "Joe Riley"],
            "state": ["Delaware", "Florida", "Illinois", "Texas", "Arkansas",
                      "Texas", "California", "South Carolina"],
            "hobby": ["Football", "Golf", "Basketball", "Reading", "Saxophone",
                      "Skydiving", "Bullying", "Jogging"],
        }
    )
    labels = {
        ("Joe Biden", "Joseph Robinette Biden"): "Yes",
        ("Donald Trump", "Donald John Trump "): "Yes",
        ("Barack Obama", "Barack Hussein Obama"): "Yes",
        ("George W. Bush", "George Walker Bush"): "Yes",
        ("Bill Clinton", "William Jefferson Clinton"): "Yes",
        ("George W. Bush", "George Herbert Walker Bush"): "No",
        ("Joe Biden", "Joe Riley"): "No",
    }
    return dfa, dfb, labels


# --------------------------------------------------------------------------
# F4: fastLink-style voters shape (data-raw/my_pkg_data.R:7-41)

_FIRST = ["James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
          "Linda", "David", "Elizabeth", "William", "Barbara", "Richard",
          "Susan", "Joseph", "Jessica", "Thomas", "Sarah", "Charles", "Karen"]
_NICK = {"James": "Jim", "Robert": "Bob", "John": "Jack", "Michael": "Mike",
         "David": "Dave", "William": "Bill", "Richard": "Dick",
         "Joseph": "Joe", "Thomas": "Tom", "Charles": "Chuck",
         "Elizabeth": "Liz", "Jennifer": "Jen", "Patricia": "Pat"}
_LAST = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
         "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzales",
         "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin"]
_STREETS = ["Oak St", "Main St", "Elm St", "Pine Ave", "Maple Dr", "Cedar Ln",
            "Lake Rd", "Hill St", "Park Ave", "Mill Rd"]
_CITIES = ["Springfield", "Riverton", "Fairview", "Greenville", "Madison",
           "Georgetown", "Salem", "Ashland", "Clinton", "Bristol"]


def voters_tables(
    n_a: int = 500, n_b: int = 400, seed: int = 42
) -> tuple[pa.Table, pa.Table, dict[tuple[str, str], str], pa.Table]:
    """Seeded fastLink-replication-shaped tables with name perturbations
    (nickname / middle-initial / typo), ``city`` as the blocking variable.

    Returns (voters_a, voters_b, oracle_labels, truth_pairs)."""
    rng = np.random.default_rng(seed)
    n_people = max(n_a, n_b) + 200
    people = []
    for i in range(n_people):
        first = _FIRST[int(rng.integers(0, len(_FIRST)))]
        middle = _FIRST[int(rng.integers(0, len(_FIRST)))]
        last = _LAST[int(rng.integers(0, len(_LAST)))]
        city = _CITIES[int(rng.integers(0, len(_CITIES)))]
        people.append(
            {
                "pid": i,
                "first": first, "middle": middle, "last": last,
                "housenum": int(rng.integers(1, 999)),
                "streetname": _STREETS[int(rng.integers(0, len(_STREETS)))],
                "city": city,
                "birthyear": int(rng.integers(1930, 2003)),
            }
        )

    def full_name(p, style: int, rng) -> str:
        first = p["first"]
        if style == 1:
            first = _NICK.get(first, first)
        middle = p["middle"] if style != 2 else p["middle"][0]
        name = f"{first} {middle} {p['last']}"
        if style == 3:
            name = f"{first} {p['last']}"
        if style == 4:
            name = _typo(rng, name)
        return " ".join(name.split())  # double-space collapse (my_pkg_data.R)

    idx_a = rng.permutation(n_people)[:n_a]
    idx_b = rng.permutation(n_people)[:n_b]

    def build(idx, styles_rng, perturb: bool):
        cols = {k: [] for k in ("full_name", "housenum", "streetname", "city", "birthyear", "pid")}
        for i in idx:
            p = people[int(i)]
            style = int(styles_rng.integers(1, 5)) if perturb else 0
            cols["full_name"].append(full_name(p, style, styles_rng))
            for k in ("housenum", "streetname", "city", "birthyear", "pid"):
                cols[k].append(p[k])
        return cols

    cols_a = build(idx_a, np.random.default_rng(seed + 1), perturb=False)
    cols_b = build(idx_b, np.random.default_rng(seed + 2), perturb=True)

    # ground truth by shared pid within city
    by_pid_b: dict[int, list[str]] = {}
    for name, pid in zip(cols_b["full_name"], cols_b["pid"]):
        by_pid_b.setdefault(pid, []).append(name)
    labels: dict[tuple[str, str], str] = {}
    tp = {"key_a": [], "key_b": [], "city": [], "label": []}
    for name_a, pid, city in zip(cols_a["full_name"], cols_a["pid"], cols_a["city"]):
        for name_b in by_pid_b.get(pid, []):
            labels[(name_a, name_b)] = "Yes"
            tp["key_a"].append(name_a)
            tp["key_b"].append(name_b)
            tp["city"].append(city)
            tp["label"].append("Yes")

    va = pa.table({k: v for k, v in cols_a.items() if k != "pid"})
    vb = pa.table({k: v for k, v in cols_b.items() if k != "pid"})
    truth = pa.table(tp)
    return va, vb, labels, truth
