#!/usr/bin/env bash
# Package the engine and run the streaming CEP job the way the north rule
# prescribes: `spark-submit --py-files` on a cluster. On a real cluster,
# swap --master for yarn/k8s and size --cores per executor; everything
# else is identical (the job reads cluster-side conf from its own args).
#
# Usage: tools/submit.sh [extra job args...]
#   e.g. tools/submit.sh --cores 8 --mode tumbling --n-clips 50000 \
#            --work /tmp/submit_run
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="${TMPDIR:-/tmp}/core_spark_pyfiles.zip"

# --py-files wants an importable archive: zip the package at repo root
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" core_spark -x '*__pycache__*')

SUBMIT="$(command -v spark-submit || true)"
if [ -z "$SUBMIT" ]; then
    SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
fi

exec "$SUBMIT" \
    --master "local[${SPARK_GRAFT_CPUS:-8}]" \
    --py-files "$ZIP" \
    "$REPO/core_spark/streaming/job.py" "$@"
