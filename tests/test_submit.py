"""spark-submit --py-files launch smoke (north_rule launch clause).

Builds dist/simkit_spark.zip, copies the CLI script into a temp dir and
submits THAT copy with a neutral cwd — so `import simkit_spark` inside
the driver can only resolve from the --py-files zip (the repo tree is
not on sys.path), proving the exact cluster launch path works
end-to-end: packaging -> submit -> synthesize -> 9-stage pipeline ->
manifests."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package

    zip_path = package.main()
    script = tmp_path / "run_pipeline.py"
    shutil.copyfile(
        os.path.join(REPO, "simkit_spark", "pipeline", "__main__.py"), script
    )
    wh = tmp_path / "wh"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            str(script),
            "--warehouse", str(wh),
            "--n-docs", "1500",
            "--n-entities", "50",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # the CLI prints one JSON summary line
    summary = json.loads(
        [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    assert summary["triples"] > 0
    # stage manifests landed (checkpoint/resume surface)
    manifests = [f for f in os.listdir(wh) if f.startswith("_manifest_")]
    assert "_manifest_triples.json" in manifests and len(manifests) >= 8
