"""Stage-boundary checkpoints with per-partition lineage manifests
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics"; SURVEY.md §4 checkpoint row, §7 B-CKPT).

A :class:`CheckpointManager` wraps named pipeline stages. Each completed
stage leaves:

* ``<dir>/<stage>/part=*/...parquet`` — the stage output, partitioned;
* ``<dir>/<stage>/MANIFEST.json`` — input fingerprint, per-file row counts
  and byte sizes, stage metrics, written atomically (tmp + rename) only
  after the parquet write finishes.

On re-run, a stage whose manifest exists and whose input fingerprint
matches is served straight from its parquet (lineage skipped); a killed job
therefore resumes without recomputing finished stages. Fingerprints chain:
a stage's fingerprint folds in its upstream fingerprint, so editing an
input invalidates everything downstream. The oracle label journal
(``oracle.py``) composes with this so resumed runs never re-spend label
budget.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import ray.data


def _fingerprint(obj) -> str:
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True, default=str).encode()
    ).hexdigest()[:32]


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.events: list[dict] = []

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _data_dir(self, name: str) -> str:
        return os.path.join(self.root, name, "data")

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), "MANIFEST.json")

    def load_manifest(self, name: str) -> dict | None:
        try:
            with open(self._manifest_path(name)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def stage(
        self,
        name: str,
        input_fingerprint: str | dict,
        build,
        metrics: dict | None = None,
    ) -> tuple["ray.data.Dataset", str]:
        """Return (dataset, fingerprint) for the stage.

        ``build()`` is only called when no valid checkpoint exists; its
        Dataset result is written to partitioned parquet and the manifest
        committed afterwards. The returned fingerprint chains input +
        stage name for downstream stages."""
        fp_in = (
            input_fingerprint
            if isinstance(input_fingerprint, str)
            else _fingerprint(input_fingerprint)
        )
        fp = _fingerprint({"stage": name, "input": fp_in})
        man = self.load_manifest(name)
        sdir = self._data_dir(name)
        if man and man.get("fingerprint") == fp and man.get("complete"):
            self.events.append({"stage": name, "action": "resume"})
            ds = ray.data.read_parquet(sdir)
            return ds, fp

        t0 = time.perf_counter()
        ds = build()
        # clear any partial output from a killed run, then write fresh
        if os.path.isdir(sdir):
            _rm_tree(sdir)
        os.makedirs(sdir, exist_ok=True)
        ds.write_parquet(sdir)
        files = []
        n_rows = 0
        import pyarrow.parquet as pq

        for f in sorted(os.listdir(sdir)):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(sdir, f)
            md = pq.read_metadata(path)
            files.append(
                {"file": f, "rows": md.num_rows, "bytes": os.path.getsize(path)}
            )
            n_rows += md.num_rows
        manifest = {
            "stage": name,
            "fingerprint": fp,
            "complete": True,
            "rows": n_rows,
            "partitions": files,
            "metrics": dict(metrics or {}),
            "sec_build": round(time.perf_counter() - t0, 3),
        }
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(name))
        self.events.append({"stage": name, "action": "build", "rows": n_rows})
        return ray.data.read_parquet(sdir), fp

    def run_manifest(self) -> dict:
        """Aggregate view across stages (the run-level lineage record)."""
        stages = {}
        if os.path.isdir(self.root):
            for name in sorted(os.listdir(self.root)):
                if not os.path.isdir(os.path.join(self.root, name)):
                    continue
                man = self.load_manifest(name)
                if man:
                    stages[name] = {
                        k: man[k] for k in ("fingerprint", "rows", "sec_build")
                        if k in man
                    }
        return {"root": self.root, "stages": stages, "events": self.events}


def _rm_tree(path: str) -> None:
    if os.path.isdir(path):
        for f in os.listdir(path):
            _rm_tree(os.path.join(path, f))
        os.rmdir(path)
    else:
        os.remove(path)
