"""Build the --py-files zip for spark-submit deployment.

Usage: python tools/package_pyfiles.py [out.zip]

Zips the ``log_analysis_system_spark`` package (source only, no tests/
caches) so a cluster run is:

    spark-submit \
        --py-files log_analysis_system_spark.zip \
        --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
        --conf spark.sql.catalog.graft=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.graft.type=hive \
        cli_main.py --input s3://bucket/transcripts --output graft \
        --buckets 4096

with ``SPARK_GRAFT_TABLE_FORMAT=iceberg`` in the driver env (the catalog
shim then writes real Iceberg tables with bucket(n, conv_id) specs). The
zip is deterministic (sorted entries, zeroed timestamps) so repeated
builds are byte-identical — convenient for artifact caching.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "log_analysis_system_spark"


def build(out_path: str) -> int:
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in sorted(os.walk(os.path.join(REPO, PKG))):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                arc = os.path.relpath(full, REPO)
                info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
                info.external_attr = 0o644 << 16
                with open(full, "rb") as f:
                    z.writestr(info, f.read())
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else f"{PKG}.zip"
    n = build(out)
    print(f"{out}: {n} files")
