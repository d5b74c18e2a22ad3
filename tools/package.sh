#!/bin/sh
# Package the engine for spark-submit --py-files (north_rule requirement).
# Produces dist/gush_spark.zip (the importable package) and dist/job.py
# (the entrypoint script spark-submit executes).
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/gush_spark.zip
python - <<'EOF'
import zipfile
from pathlib import Path

with zipfile.ZipFile("dist/gush_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(Path("gush_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("dist/gush_spark.zip:", len(z.namelist()), "files")
EOF
cp gush_spark/job.py dist/job.py
echo "submit with:"
echo "  spark-submit --py-files dist/gush_spark.zip dist/job.py --pipeline featurize --input <pages> --sink <out> --checkpoint <ckpt>"
