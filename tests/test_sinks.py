"""Resumable partitioned-parquet sink (raylink/sinks.py): atomic per-key
commit, skip-finished resume, committed-only read-back."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import ray.data as rd

from raylink.sinks import finished_keys, read_partitioned, write_partitioned


def _mk(tmp_path):
    root = str(tmp_path / "out")
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {"lang": rng.choice(["en", "fr", "de"], 100), "x": range(100)}
    )
    return root, df


def test_write_read_roundtrip(ray_session, tmp_path):
    root, df = _mk(tmp_path)
    r = write_partitioned(rd.from_pandas(df).repartition(4), root, "lang")
    assert sorted(r["written"]) == ["de", "en", "fr"]
    assert r["rows_written"] == 100 and r["skipped"] == []
    # hive-style layout with committed manifests
    for k in ("de", "en", "fr"):
        man = json.load(open(os.path.join(root, f"lang={k}", "_MANIFEST.json")))
        assert man["rows"] == int((df["lang"] == k).sum())
    back = read_partitioned(root, "lang").to_pandas()
    assert sorted(back["x"].tolist()) == list(range(100))


def test_resume_skips_finished_partitions(ray_session, tmp_path):
    root, df = _mk(tmp_path)
    write_partitioned(rd.from_pandas(df).repartition(4), root, "lang")
    # simulate a killed run: one partition gone, a stale tmp dir left over
    shutil.rmtree(os.path.join(root, "lang=fr"))
    os.makedirs(os.path.join(root, "_tmp-fr-999"), exist_ok=True)
    mt = os.path.getmtime(os.path.join(root, "lang=en", "_MANIFEST.json"))
    r2 = write_partitioned(rd.from_pandas(df).repartition(4), root, "lang")
    assert r2["written"] == ["fr"] and sorted(r2["skipped"]) == ["de", "en"]
    # finished partitions are byte-untouched, the missing one is rebuilt
    assert os.path.getmtime(os.path.join(root, "lang=en", "_MANIFEST.json")) == mt
    assert len(read_partitioned(root, "lang").to_pandas()) == 100
    # a partition dir WITHOUT a manifest is not "finished"
    os.remove(os.path.join(root, "lang=de", "_MANIFEST.json"))
    assert finished_keys(root, "lang") == ["en", "fr"]


def test_skip_finished_false_rewrites_all(ray_session, tmp_path):
    root, df = _mk(tmp_path)
    write_partitioned(rd.from_pandas(df).repartition(2), root, "lang")
    r = write_partitioned(
        rd.from_pandas(df).repartition(2), root, "lang", skip_finished=False
    )
    assert sorted(r["written"]) == ["de", "en", "fr"] and r["rows_written"] == 100
