#!/usr/bin/env python
"""spark-submit entrypoint for the extraction pipeline.

Cluster:
    python -c "from pdf_ocr_spark.session import package_zip; \\
               print(package_zip('.'))"
    spark-submit --py-files pdf_ocr_spark.zip \\
        --conf spark.sql.execution.arrow.maxRecordsPerBatch=256 \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.sources.partitionOverwriteMode=dynamic \\
        jobs/run_extract.py --input ... --output ... --lineage ...

Local (no spark-submit): runs on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--snapshot-id", default=None,
                    help="input snapshot identity for resume scoping")
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    # cluster_session honors a spark-submit-provided master (a plain
    # script under spark-submit has no pre-created session, so the old
    # getActiveSession() probe silently fell back to local mode)
    from pdf_ocr_spark.session import cluster_session
    spark = cluster_session("pdf-ocr-extract")

    from pdf_ocr_spark.pipeline import run_extraction

    metrics = run_extraction(
        spark, args.input, args.output, args.lineage,
        run_id=args.run_id, input_snapshot_id=args.snapshot_id,
        num_buckets=args.buckets, num_partitions=args.partitions,
        resume=not args.no_resume)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
