#!/usr/bin/env python
"""spark-submit entrypoint: dedup over an extraction run's output.

Composes the extraction pipeline's output table with the relational dedup
library (the VERDICT r3 composition gap): exact duplicate groups, near-dup
pairs, and keep-one-per-cluster labels over (conv_id, turn_idx,
extracted_text).

Cluster:
    spark-submit --py-files pdf_ocr_spark.zip jobs/dedup_extracted.py \\
        --extracted /path/to/extraction-output \\
        --out /path/to/dedup-out [--min-jaccard 0.5]

``--extracted`` is the parquet (production: Iceberg) table written by
jobs/run_extract.py / run_extraction. Writes three tables under --out:
exact_groups/, neardup_pairs/, clusters/.
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
    ap.add_argument("--min-jaccard", type=float, default=0.5)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    # cluster_session honors a spark-submit-provided master (a plain
    # script under spark-submit has no pre-created session, so the old
    # getActiveSession() probe silently fell back to local mode)
    from pdf_ocr_spark.session import cluster_session
    spark = cluster_session("pdf-ocr-dedup-extracted")

    from pdf_ocr_spark.dedup_extracted import (
        dedup_extracted_clusters, dedup_extracted_exact,
        dedup_extracted_neardup,
    )

    extracted = spark.read.parquet(args.extracted)
    stats = {}
    for name, df in (
            ("exact_groups", dedup_extracted_exact(extracted)),
            ("neardup_pairs",
             dedup_extracted_neardup(extracted, args.min_jaccard)),
            ("clusters",
             dedup_extracted_clusters(extracted, args.min_jaccard))):
        path = os.path.join(args.out, name)
        df.write.mode("overwrite").parquet(path)
        stats[name] = spark.read.parquet(path).count()
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
