"""spark-submit entrypoint for checkpointed validation runs.

The north-rule deployment loop end to end: persist the model once as its
JSON spec (``Model.spec_json()`` — self-contained, constraints included),
ship the engine as a ``--py-files`` zip (:mod:`patito_spark.submit`), and
run/resume validation from the cluster edge::

    spark-submit --py-files patito_spark.zip validate_job.py \\
        --spec model_spec.json --input s3://crawl/pages \\
        --partition-col crawl_date --checkpoint-table lake.ckpt.pages

where ``validate_job.py`` is two lines::

    from patito_spark.jobs import main
    raise SystemExit(main())

Re-running the same command resumes: finished partitions are read back
from the checkpoint and skipped.  Output is one JSON line (run id, counts,
skipped partitions) on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional, Sequence


def main(argv: Optional[Sequence[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="patito_spark.jobs", description="checkpointed validation run"
    )
    parser.add_argument(
        "--spec", required=True, help="path to a Model.spec_json() file"
    )
    parser.add_argument(
        "--input",
        required=True,
        help="parquet path/glob, or 'table:<catalog table name>'",
    )
    parser.add_argument("--partition-col", required=True)
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--checkpoint-table", default=None)
    parser.add_argument(
        "--where", default=None, help="SQL filter pushed into the scan"
    )
    parser.add_argument("--run-id", default=None)
    parser.add_argument(
        "--fail-on-violations",
        action="store_true",
        help="exit 1 when any partition fails (default: exit 0, report only)",
    )
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession

    from .plans.runner import ValidationRunner
    from .spec import model_from_spec_json

    spark = SparkSession.builder.getOrCreate()
    with open(args.spec) as fh:
        model = model_from_spec_json(fh.read())
    if args.input.startswith("table:"):
        df = spark.table(args.input[len("table:"):])
    else:
        df = spark.read.parquet(args.input)

    runner = ValidationRunner(
        model,
        args.partition_col,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_table=args.checkpoint_table,
    )
    result = runner.run(df, run_id=args.run_id, where=args.where)
    print(
        json.dumps(
            {
                "run_id": result.run_id,
                "passed": result.passed,
                "partitions_validated": len(result.verdicts),
                "partitions_skipped": len(result.skipped_partitions),
                "violations": sum(
                    v["violation_count"] for v in result.violations
                ),
            }
        )
    )
    return 1 if (args.fail_on_violations and not result.passed) else 0


if __name__ == "__main__":  # pragma: no cover - exercised via spark-submit
    sys.exit(main())
