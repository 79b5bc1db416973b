#!/usr/bin/env bash
# Package the engine for spark-submit --py-files deployment (north_rule).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/osm_coverage_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/osm_coverage_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("osm_coverage_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/osm_coverage_spark.zip")
EOF
