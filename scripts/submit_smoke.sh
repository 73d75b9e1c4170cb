#!/usr/bin/env bash
# Prove the north-rule deployment path: package fastpasta_spark as a
# --py-files zip and run a check-all job through spark-submit, with the
# package reachable ONLY via the zip (cwd is a scratch dir, PYTHONPATH
# unset). Usage: scripts/submit_smoke.sh [n_docs] [master]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
N_DOCS="${1:-2000}"
MASTER="${2:-local[4]}"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

ZIP="$WORK/fastpasta_spark.zip"
(cd "$REPO" && python - "$ZIP" <<'EOF'
import sys, zipfile, pathlib
zp = zipfile.ZipFile(sys.argv[1], "w", zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path("fastpasta_spark").rglob("*.py")):
    zp.write(p, p.as_posix())
zp.close()
EOF
)
cp "$REPO/scripts/submit_job.py" "$WORK/submit_job.py"

cd "$WORK"
env -u PYTHONPATH spark-submit --master "$MASTER" \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" submit_job.py "$N_DOCS"
