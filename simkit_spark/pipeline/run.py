"""End-to-end KG-construction pipeline with checkpoint-resumable stage
boundaries (every stage = one TableStore write + lineage manifest;
resume skips stages whose manifest matches its inputs — the pattern the
reference realizes with per-stage Neo4j round-trips, SURVEY.md §3.2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import TableStore
from .embed import DEFAULT_DIM, embed_distinct_surfaces
from .extract import detect_mentions, explode_spans, raw_triples_from_mentions
from .link import link_entities
from .materialize import build_edges, build_nodes, build_provenance, resolve_triples


@dataclass
class PipelineConfig:
    seed: int = 42
    # None -> auto-sized from the distinct-surface count (embed.auto_dim):
    # a fixed 256-dim hash space silently degrades linking P/R once the
    # vocabulary outgrows it
    dim: int | None = None
    # 0.75: keeps alias pairs (>=0.8 after surface normalization) and
    # rejects the near-collision band 0.65 admitted — at 8000 ambiguous
    # entities the 0.65 threshold cost ~35 precision points (measured),
    # at small vocabularies both give P/R = 1.0
    tau: float = 0.75
    n_salt: int = 16
    # None -> spark.sql.shuffle.partitions at run time: bucket count must
    # scale with the cluster or it CAPS stage parallelism (16 buckets on
    # 32 cores leaves half the cluster idle)
    doc_buckets: int | None = None
    use_salting: bool = True


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    store: TableStore,
    cfg: PipelineConfig | None = None,
    force: bool = False,
    timings: dict | None = None,
) -> dict[str, DataFrame]:
    """documents(doc_id, spans) -> {mentions, raw_triples, surfaces,
    entity_map, triples, nodes, edges, provenance} — each persisted as a
    stage table with a lineage manifest.

    ``timings``: pass a dict to collect per-stage wall seconds (stage
    compute + table write; lineage metrics ride the write job via
    observe()) — the first thing to read when throughput regresses or a
    cluster resize doesn't pay."""
    import time as _time  # noqa: PLC0415

    cfg = cfg or PipelineConfig()

    def staged(name: str, fn, **kw) -> DataFrame:
        t0 = _time.time()
        out = store.run_stage(name, fn, **kw)
        if timings is not None:
            timings[name] = round(_time.time() - t0, 3)
        return out

    # resolve locally — mutating the caller's cfg would pin the first
    # session's shuffle-partition count onto a reused config object
    doc_buckets = cfg.doc_buckets
    if doc_buckets is None:
        doc_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    spans = explode_spans(documents)

    # mentions first (it feeds the dim resolution); its fingerprint
    # cannot depend on dim (detection is dim-free). with_pred=True:
    # the mentions pass is the ONLY matcher pass over the span text —
    # raw triples derive from this table in pure SQL (narrow rows),
    # halving the pipeline's text-scan work
    mentions = staged(
        "mentions",
        lambda: detect_mentions(spans, with_pred=True),
        inputs={"seed": cfg.seed, "stage": "mentions", "pred": True},
        force=force,
        bucket_by=(doc_buckets, "doc_id"),
    )
    dim = cfg.dim
    if dim is None:
        from .embed import auto_dim

        t0 = _time.time()
        # tier choice (256/512/1024) only needs the vocabulary's order
        # of magnitude: HLL is one partial-agg pass (no distinct
        # shuffle) and is partitioning-independent, so the chosen dim —
        # and every downstream fingerprint — stays deterministic
        dim = auto_dim(
            mentions.agg(F.approx_count_distinct("surface")).first()[0]
        )
        if timings is not None:
            timings["auto_dim"] = round(_time.time() - t0, 3)
    fp = {"seed": cfg.seed, "dim": dim, "tau": cfg.tau}
    # independent stages run as CONCURRENT Spark jobs (driver threads):
    # actions submitted from different threads schedule side by side on
    # the same executors, so sibling output tables don't serialize the
    # pipeline — raw_triples || surfaces (both read only mentions),
    # triples || nodes (both need entity_map, not each other), then
    # edges || provenance (both read triples). Per-stage `timings`
    # remain true wall per stage; overlapped stages sum to more than
    # the pipeline wall by design.
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_raw = pool.submit(
            staged,
            "raw_triples",
            lambda: raw_triples_from_mentions(mentions),
            inputs={**fp, "stage": "raw_triples", "from": "mentions"},
            force=force,
            bucket_by=(doc_buckets, "doc_id"),
        )
        f_surf = pool.submit(
            staged,
            "surfaces",
            lambda: embed_distinct_surfaces(mentions, dim),
            inputs={**fp, "stage": "surfaces"},
            force=force,
        )
        raw_triples, surfaces = f_raw.result(), f_surf.result()
        entity_map = staged(
            "entity_map",
            lambda: link_entities(surfaces, mentions, dim, cfg.tau, cfg.seed),
            inputs={**fp, "stage": "entity_map"},
            force=force,
        )
        f_triples = pool.submit(
            staged,
            "triples",
            lambda: resolve_triples(
                raw_triples, entity_map, cfg.use_salting, cfg.n_salt
            ),
            inputs={**fp, "stage": "triples"},
            force=force,
            bucket_by=(doc_buckets, "doc_id"),
        )
        f_nodes = pool.submit(
            staged,
            "nodes",
            lambda: build_nodes(entity_map, mentions),
            inputs={**fp, "stage": "nodes"},
            force=force,
        )
        triples, nodes = f_triples.result(), f_nodes.result()
        f_edges = pool.submit(
            staged,
            "edges",
            lambda: build_edges(triples),
            inputs={**fp, "stage": "edges"},
            force=force,
        )
        f_prov = pool.submit(
            staged,
            "provenance",
            lambda: build_provenance(triples),
            inputs={**fp, "stage": "provenance"},
            force=force,
            bucket_by=(doc_buckets, "doc_id"),
        )
        edges, provenance = f_edges.result(), f_prov.result()
    return {
        "mentions": mentions,
        "raw_triples": raw_triples,
        "surfaces": surfaces,
        "entity_map": entity_map,
        "triples": triples,
        "nodes": nodes,
        "edges": edges,
        "provenance": provenance,
    }


def triple_prf(emitted: DataFrame, truth: DataFrame, alias_map: DataFrame | None = None) -> dict:
    """Precision/recall/F1 of emitted canonical triples vs ground truth.

    Compared on distinct (subj, pred, obj) string triples — the
    reference's emitted-triples contract (BASELINE.json metric).

    alias_map(surface, canonical): entity-level normalization — the
    pipeline's cluster representative may be any legitimate alias of
    the entity, so both endpoints are translated through the reference
    alias dictionary before comparison. Over-merged clusters still fail
    (both entities collapse onto one representative), so the metric
    stays sensitive to linking errors.
    """
    got = emitted.select("subj", "pred", "obj").distinct()
    if alias_map is not None:
        s_map = alias_map.select(
            F.col("surface").alias("subj"), F.col("canonical").alias("subj_c")
        )
        o_map = alias_map.select(
            F.col("surface").alias("obj"), F.col("canonical").alias("obj_c")
        )
        got = (
            got.join(s_map, "subj", "left")
            .join(o_map, "obj", "left")
            .select(
                F.coalesce("subj_c", "subj").alias("subj"),
                "pred",
                F.coalesce("obj_c", "obj").alias("obj"),
            )
            .distinct()
        )
    want = truth.select("subj", "pred", "obj").distinct()
    tp = got.join(want, ["subj", "pred", "obj"], "leftsemi").count()
    n_got = got.count()
    n_want = want.count()
    p = tp / n_got if n_got else 0.0
    r = tp / n_want if n_want else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "emitted": n_got, "truth": n_want}
