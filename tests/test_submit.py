"""The north-rule deployment path: spark-submit --py-files must carry
the whole package to driver + executor Python workers with no repo on
sys.path (scripts/submit_smoke.sh runs from a scratch cwd with
PYTHONPATH unset)."""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_submit_py_files_smoke():
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "submit_smoke.sh"), "500"],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    # the synthetic corpus at corrupt_per_mille=80 must produce a broad
    # spread of error codes through the zip-shipped Arrow workers
    assert res["docs"] >= 500
    assert res["violations"] > 0
    assert res["codes"] >= 10
