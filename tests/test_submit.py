"""spark-submit --py-files deployment smoke test (the north rule's shipping
mode): the engine must run a validation job from a zip artifact in a fresh
JVM/Python process with no installed package."""

import os
import pathlib
import subprocess
import sys
import zipfile

from patito_spark.submit import build_pyfiles_zip

JOB = """
import sys
from pyspark.sql import SparkSession

import patito_spark as pt
from patito_spark.plans.checks import find_errors

spark = SparkSession.builder.getOrCreate()


class Document(pt.Model):
    doc_id: int
    lang: str = pt.Field(allowed=["en", "de", "fr", "es", "zh"])
    n_chars: int = pt.Field(ge=0, le=100_000)


df = spark.read.parquet(sys.argv[1]).select("doc_id", "lang", "n_chars")
errors = find_errors(df, Document)
print(f"SUBMIT_OK rows={df.count()} error_kinds={len(errors)}", flush=True)
spark.stop()
"""


def test_build_pyfiles_zip_contents(tmp_path):
    zip_path = build_pyfiles_zip(str(tmp_path / "patito_spark.zip"))
    names = zipfile.ZipFile(zip_path).namelist()
    assert "patito_spark/__init__.py" in names
    assert "patito_spark/plans/checks.py" in names
    assert not any("__pycache__" in n for n in names)


def test_spark_submit_validation_job_resumes(tmp_path, sf_dir, spark):
    """The full deployment loop: spec_json artifact + --py-files zip +
    jobs.main via spark-submit, twice — the second run resumes from the
    checkpoint and validates zero new partitions."""
    import json

    import patito_spark as pt

    class Document(pt.Model):
        doc_id: int
        lang: str = pt.Field(allowed=["en", "de", "fr", "es", "zh"])
        n_chars: int = pt.Field(ge=0, le=100_000)

    spec = tmp_path / "spec.json"
    spec.write_text(Document.spec_json())
    zip_path = build_pyfiles_zip(str(tmp_path / "patito_spark.zip"))
    job = tmp_path / "job.py"
    job.write_text(
        "from patito_spark.jobs import main\nraise SystemExit(main())\n"
    )
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def run():
        proc = subprocess.run(
            [
                "spark-submit",
                "--master", "local[2]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=2",
                "--py-files", zip_path,
                str(job),
                "--spec", str(spec),
                "--input", f"{sf_dir}/documents.parquet",
                "--partition-col", "lang",
                "--checkpoint-dir", str(ckpt),
            ],
            capture_output=True, text=True, env=env,
            cwd=str(tmp_path), timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    first = run()
    assert first["partitions_validated"] > 0
    assert first["partitions_skipped"] == 0
    second = run()
    assert second["partitions_validated"] == 0
    assert second["partitions_skipped"] == first["partitions_validated"]


def test_spark_submit_py_files_runs_validation(tmp_path, sf_dir):
    zip_path = build_pyfiles_zip(str(tmp_path / "patito_spark.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # a clean cwd so the job cannot import the package from the repo —
    # it must come from the --py-files zip
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--py-files", zip_path,
            str(job),
            f"{sf_dir}/documents.parquet",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),
        timeout=300,
    )
    assert "SUBMIT_OK" in proc.stdout, proc.stderr[-4000:]
