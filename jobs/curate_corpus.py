#!/usr/bin/env python
"""spark-submit entrypoint: full training-corpus curation over an
extraction run's output.

Composes extraction output with the audited curation chain
(pdf_ocr_spark/curate.py): keep-one-per-cluster near-dup removal ->
quality/repetition filtering -> optional semantic (embedding) dedup ->
stable train/val/test split -> per-(split, shard) sequence packing.

Cluster:
    spark-submit --py-files pdf_ocr_spark.zip jobs/curate_corpus.py \\
        --extracted /path/to/extraction-output \\
        --out /path/to/curated \\
        [--budget 2048] [--shards 8] [--count-mode pretok] \\
        [--semantic-threshold 0.5] [--min-quality 0.30] \\
        [--jaccard-threshold 0.5]

``--extracted`` is the parquet (production: Iceberg) table written by
jobs/run_extract.py. The output is one packed-sequence table
partitioned by (split, shard). ``--count-mode pretok`` budgets with the
CJK-aware pre-tokenizer (the right count for unspaced scripts);
``--semantic-threshold`` enables the embedding-space dedup stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--extracted", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--min-quality", type=float, default=0.30)
    ap.add_argument("--jaccard-threshold", type=float, default=0.5)
    ap.add_argument("--count-mode", choices=["ws", "pretok"], default="ws")
    ap.add_argument("--semantic-threshold", type=float, default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    from pdf_ocr_spark.session import cluster_session
    spark = cluster_session("pdf-ocr-curate")

    from pdf_ocr_spark.curate import curate_corpus

    curated = curate_corpus(
        spark.read.parquet(args.extracted),
        jaccard_threshold=args.jaccard_threshold,
        min_quality=args.min_quality,
        n_shards=args.shards, budget=args.budget,
        semantic_threshold=args.semantic_threshold,
        count_mode=args.count_mode)
    (curated.write.mode("overwrite")
     .partitionBy("split", "shard").parquet(args.out))
    rows = spark.read.parquet(args.out).count()
    print(json.dumps({"curated_rows": int(rows), "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
