"""Packaging for ``spark-submit --py-files`` deployment.

The north rule ships the validation job to a multi-executor cluster via
``spark-submit --py-files``: the package must be importable on every
executor from a single zip artifact with no install step.  patito_spark is
pure Python with no third-party dependencies beyond pyspark itself (numpy/
pandas only inside optional Arrow stages, already present on any PySpark
cluster), so one zip of the package tree is the whole deployment.
"""

from __future__ import annotations

import pathlib
import zipfile
from typing import Optional


def build_pyfiles_zip(dest: str, package_root: Optional[str] = None) -> str:
    """Zip the ``patito_spark`` package for ``spark-submit --py-files``.

    Writes every ``*.py`` under the package (skipping caches) into *dest*
    with ``patito_spark/``-rooted archive names, so the zip lands directly
    on ``sys.path``.  Returns *dest*.

    Usage::

        zip_path = build_pyfiles_zip("/tmp/patito_spark.zip")
        # spark-submit --py-files /tmp/patito_spark.zip job.py ...
    """
    root = pathlib.Path(package_root or pathlib.Path(__file__).parent).resolve()
    dest_path = pathlib.Path(dest)
    dest_path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(dest_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(root.rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            arcname = pathlib.Path(root.name) / py.relative_to(root)
            zf.write(py, arcname=str(arcname))
    return str(dest_path)
