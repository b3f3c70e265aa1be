"""The committed ROWSONLY_HASHES.json must regenerate byte-identical —
content verification for the queries the driver can only row-count
(VERDICT r2 'what's missing' #3). Runs under the shared session, whose
parallelism differs from the tool's local[8]: a mismatch here means a
rows-only operator's output became partitioning- or run-dependent,
which is exactly what the artifact exists to catch."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_rowsonly_hashes_regenerate(spark):
    import rowsonly_hash as rh

    with open(rh.ARTIFACT) as f:
        want = json.load(f)["queries"]
    got = rh.compute(spark)
    assert got == want
