"""Scaling-efficiency evidence (BASELINE.json: throughput scaling
efficiency >= 0.8 from N to 4N executors).

Sandbox proxy per BASELINE.md: the identical KG-pipeline job at two
parallelism levels (local[8] vs local[32]) on the same input, each in a
fresh JVM subprocess; efficiency = throughput(32) / (4 x throughput(8)).
Writes BENCH/BASELINE.md.

Note on the proxy's limits: local-mode cores share one JVM heap and one
node's memory bandwidth, so 4x cores never yields 4x throughput even
for embarrassingly parallel stages; the cluster analogue (4x executors
= 4x heaps + 4x IO) is strictly more favorable. We report the measured
local ratio and the per-stage task-parallelism evidence.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

RUNNER = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from simkit_spark.session import get_spark
from simkit_spark.catalog import TableStore
from simkit_spark.corpus import synthesize
from simkit_spark.pipeline.run import PipelineConfig, run_pipeline

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2])
spark = get_spark(f"scale{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=max(cpus, 8))
docs, _ = synthesize(spark, n_docs=n_docs, n_entities=200, seed=42, partitions=max(cpus, 8))
docs = docs.localCheckpoint()  # materialize input so we time the pipeline, not the generator
with tempfile.TemporaryDirectory() as wh:
    t0 = time.time()
    out = run_pipeline(spark, docs, TableStore(spark, wh), PipelineConfig(seed=42))
    n = out["triples"].count()
    dt = time.time() - t0
print(json.dumps({{"cpus": cpus, "secs": dt, "docs": n_docs, "docs_per_sec": n_docs/dt, "triples": n}}))
spark.stop()
"""


def run(cpus: int, n_docs: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = RUNNER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_docs)],
        capture_output=True, text=True, timeout=1200, cwd=repo,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    n_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "20000"))
    lo = run(8, n_docs)
    hi = run(32, n_docs)
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by tools/bench_scaling.py.

Identical KG-construction job (synthesize {n_docs} interleaved docs ->
extract -> embed -> LSH link -> CC merge -> materialize triples) at two
parallelism levels, fresh JVM each (the sandbox proxy for N vs 4N
executors, per BASELINE.md):

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[8]  (N)  | {lo['secs']:.1f} | {lo['docs_per_sec']:.1f} |
| local[32] (4N) | {hi['secs']:.1f} | {hi['docs_per_sec']:.1f} |

**Scaling efficiency (local proxy) = throughput(4N) / (4 x throughput(N))
= {eff:.3f}** (speedup {hi['docs_per_sec']/lo['docs_per_sec']:.2f}x of the ideal 4x).

Caveat: local-mode cores share ONE JVM heap, one shuffle service and one
node's memory bandwidth, so this proxy under-reports true multi-executor
scaling (4N executors bring 4x heaps + 4x IO). All pipeline stages are
shuffle-partitioned (no driver-side loops over rows, no collect of
per-row data); per-stage parallelism scales with
spark.sql.shuffle.partitions, which the harness sets to the core count.
"""
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"n8": lo, "n32": hi, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
