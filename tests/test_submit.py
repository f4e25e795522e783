"""The north rule's launch contract: spark-submit --py-files dist/engine.zip.

Runs the REAL spark-submit binary from a temp cwd so the driver and the
workers import the engine only from the zipped artifact — the deployment
shape of a multi-executor cluster — then re-submits against the same
warehouse to prove checkpoint resume across separate submit invocations.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

from information_extraction_from_biographies_spark.plans.pipeline import STAGES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(zip_path, tmp_path, *extra):
    spark_submit = shutil.which("spark-submit")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "run_pipeline.py"),
        "--synth", "6", *extra,
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=420
    )
    line = next((ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")), None)
    assert line is not None, proc.stdout[-2000:] + proc.stderr[-4000:]
    return json.loads(line[len("RESULT "):])


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_pyfiles_end_to_end_and_resume(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_pyfiles

    zip_path = make_pyfiles.build(str(tmp_path / "engine.zip"))
    wh = str(tmp_path / "wh")

    first = _submit(zip_path, tmp_path, "--warehouse", wh)
    assert first["precision"] == 1.0 and first["recall"] == 1.0
    assert len(first["executed_stages"]) == len(STAGES) and not first["skipped_stages"]
    assert first["master"] == "local[4]"  # --master from the launch command won

    second = _submit(zip_path, tmp_path, "--warehouse", wh)
    assert not second["executed_stages"] and len(second["skipped_stages"]) == len(STAGES)
    assert second["precision"] == 1.0 and second["recall"] == 1.0
