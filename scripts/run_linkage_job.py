"""Cluster job entrypoint for the linkage pipeline.

This is what ``ray job submit -- python scripts/run_linkage_job.py ...``
executes on a multi-node cluster (north_rule). In this sandbox it runs
against the local session; the pipeline itself is partitioning-explicit and
has no single-node assumptions.

Example:
    ray job submit --working-dir . -- python scripts/run_linkage_job.py \
        --input-a /data/corpus_a --input-b /data/corpus_b \
        --by key --blocking lang \
        --truth /data/truth.parquet \
        --out /data/linked --checkpoint-dir /data/ckpt

Outputs:
    <out>/linked/          dfA-complete linkage table (partitioned parquet)
    <out>/accepted/        accepted pair table
    <out>/clusters.parquet entity clusters
    <out>/run_manifest.json  metrics + lineage + config
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-a", required=True, help="parquet path/dir for side A")
    ap.add_argument("--input-b", required=True, help="parquet path/dir for side B")
    ap.add_argument("--by", default="key")
    ap.add_argument("--blocking", nargs="*", default=None)
    ap.add_argument("--truth", default=None,
                    help="labeled-pairs parquet backing the deterministic oracle "
                         "(key_a,key_b,label); omit to plug an LLM oracle in code")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--corpus", action="store_true",
                    help="inputs are (repo,path,commit,lang,content) corpus tables: "
                         "derive key + content_sha256")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max-labels", type=int, default=10_000)
    ap.add_argument("--loop-mode", default="auto", choices=["auto", "driver", "streaming"])
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local mode only; on a cluster, omit (ray job provides the cluster)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    import ray.data as rd

    import raylink
    from raylink.schema import prepare_corpus

    ds_a = rd.read_parquet(args.input_a)
    ds_b = rd.read_parquet(args.input_b)
    if args.corpus:
        ds_a, ds_b = prepare_corpus(ds_a), prepare_corpus(ds_b)

    if args.truth:
        import pyarrow.parquet as pq

        from raylink.synth import truth_label_dict

        oracle = raylink.DeterministicOracle(truth_label_dict(pq.read_table(args.truth)))
    else:
        raise SystemExit(
            "no --truth given: wire an LLM oracle via raylink.CallableOracle "
            "in code (no network access in this sandbox)"
        )

    cfg = raylink.LinkConfig(
        by=args.by,
        blocking=args.blocking or None,
        seed=args.seed,
        max_labels=args.max_labels,
        loop_mode=args.loop_mode,
        checkpoint_dir=args.checkpoint_dir,
    )
    res = raylink.fuzzylink(ds_a, ds_b, oracle, cfg)

    os.makedirs(args.out, exist_ok=True)
    # partitioned by blocking key when blocking: a rerun can skip finished
    # block directories (resumable output layout)
    if args.blocking:
        res.linked.write_parquet(
            os.path.join(args.out, "linked"), partition_cols=["block"]
        )
        res.accepted.write_parquet(
            os.path.join(args.out, "accepted"), partition_cols=["block"]
        )
    else:
        res.linked.write_parquet(os.path.join(args.out, "linked"))
        res.accepted.write_parquet(os.path.join(args.out, "accepted"))
    import pandas as pd

    if isinstance(res.clusters, pd.DataFrame):
        # driver mode: union-find table
        res.clusters.to_parquet(os.path.join(args.out, "clusters.parquet"))
    else:
        # streaming mode: distributed label-propagation Dataset
        res.clusters.write_parquet(os.path.join(args.out, "clusters"))
    with open(os.path.join(args.out, "run_manifest.json"), "w") as f:
        json.dump(
            {
                "config": {
                    "by": cfg.by, "blocking": cfg.blocking, "seed": cfg.seed,
                    "max_labels": cfg.max_labels, "loop_mode": cfg.loop_mode,
                },
                "cutoff": res.cutoff,
                "metrics": res.metrics,
            },
            f,
            indent=1,
            default=str,
        )
    print(json.dumps({"out": args.out, "metrics": res.metrics}, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
