"""Stage 4 — materialize nodes/edges/triples with lineage + exactly-once resume.

Blarify persists via idempotent APOC merges in batches
(reference: blarify/repositories/graph_db_manager/neo4j_manager.py:87-197,
merge-on-key :128-142) and tracks long-running work with leased DB state
(processing_status / processing_run_id,
documentation/queries/batch_processing_queries.py:39-399). The Spark
restatement (SURVEY.md Q16 / §3.2):

* tables are partitioned parquet dirs (Iceberg DDL identical modulo
  `USING iceberg`; snapshot commit = our _SUCCESS marker + manifest row)
* idempotency comes from deterministic content-derived keys plus
  dropDuplicates before write — a re-run produces byte-identical tables
* the checkpoint manifest is a per-(run_id, stage) record with
  per-partition lineage (partition id, row count) written ONLY after the
  stage's data commit succeeds; resume consults it and replays only
  missing stages — kill-after-stage-k then rerun yields identical output
* head-entity skew at write time is handled by salted repartitioning:
  the shuffle key is (subj_id, salt) so one dominant entity spreads over
  SALT_BUCKETS writers instead of one straggler task
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from blarify_spark.functions.checkpoint import cut_lineage as _cut

SALT_BUCKETS = 8

TRIPLE_COLS = [
    "url",
    "warc_ts",
    "pred",
    "subj_id",
    "obj_id",
    "subj",
    "obj",
    "span_start",
    "span_end",
]


# ---------------------------------------------------------------------------
# Checkpoint manifest
# ---------------------------------------------------------------------------


def _manifest_path(out_dir: str, run_id: str, stage: str) -> str:
    return os.path.join(out_dir, "_manifest", run_id, f"{stage}.json")


def stage_committed(out_dir: str, run_id: str, stage: str) -> bool:
    return os.path.exists(_manifest_path(out_dir, run_id, stage))


def read_manifest(out_dir: str, run_id: str, stage: str) -> dict:
    with open(_manifest_path(out_dir, run_id, stage)) as fh:
        return json.load(fh)


def _commit_stage(
    df: DataFrame, out_dir: str, run_id: str, stage: str, path: str
) -> None:
    """Write per-partition lineage rows, then the manifest marker.

    The data files were already committed (parquet _SUCCESS) by the
    caller; the manifest write is the stage's commit point — a crash
    between data write and manifest write causes a clean re-write of the
    same deterministic data on resume (idempotent), never a half-read.
    """
    lineage = [
        {"partition_id": int(r["pid"]), "rows_out": int(r["n"])}
        for r in df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    manifest = {
        "run_id": run_id,
        "stage": stage,
        "path": path,
        "rows_out": sum(r["rows_out"] for r in lineage),
        "n_partitions": len(lineage),
        "lineage": sorted(lineage, key=lambda r: r["partition_id"]),
    }
    mpath = _manifest_path(out_dir, run_id, stage)
    os.makedirs(os.path.dirname(mpath), exist_ok=True)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, mpath)  # atomic rename = commit


def materialize_stage(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    stage: str,
    compute: Callable[[], DataFrame],
    partition_cols: list[str] | None = None,
    salt_on: str | None = None,
    resume: bool = True,
) -> DataFrame:
    """Run one pipeline stage with checkpoint-resume semantics.

    If the (run_id, stage) manifest exists, the stage is skipped and its
    output is read back (exactly-once). Otherwise compute -> write to a
    UNIQUE staging directory -> atomic rename claim -> commit manifest.

    Stage data is namespaced by run_id (out_dir/run_id/stage) so two runs
    over the same out_dir cannot cross-contaminate: a second run_id that
    crashes mid-write can never corrupt what the first run_id's manifest
    points at (its data lives in a different directory).

    Concurrent-writer isolation (the Iceberg optimistic-concurrency
    commit semantic, minus the catalog — reference idempotent-merge
    contract: blarify neo4j_manager.py:128-142): each writer lands its
    parquet in out_dir/run_id/.staging/<stage>-<unique>, then CLAIMS the
    final path with one atomic directory rename. Exactly one writer's
    rename succeeds; losers discard their staging output and adopt the
    winner's table (stages are deterministic, so the data is identical).
    Readers therefore never observe a half-written final directory, and
    two racing writers can no longer interleave a destructive overwrite.
    A complete-but-uncommitted final directory (winner crashed between
    rename and manifest) is adopted and committed on the next attempt;
    a partial legacy directory (no parquet _SUCCESS) is discarded.
    """
    path = os.path.join(out_dir, run_id, stage)
    if resume and stage_committed(out_dir, run_id, stage):
        return spark.read.parquet(path)

    def _adopt() -> DataFrame:
        out = spark.read.parquet(path)
        if not stage_committed(out_dir, run_id, stage):
            _commit_stage(out, out_dir, run_id, stage, path)
        return out

    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            # complete data landed by a concurrent or crashed writer:
            # the rename claim is atomic, so _SUCCESS implies the whole
            # table — adopt it instead of recomputing
            return _adopt()
        shutil.rmtree(path)  # partial pre-staging-layout write

    df = compute()
    if salt_on is not None:
        # Composite shuffle key: head entity rows spread over SALT_BUCKETS
        # writer tasks instead of hot-spotting one. Explicit partition count
        # so AQE cannot coalesce the salt away (at cluster scale set this
        # to ~2-3x total cores).
        df = df.repartition(
            SALT_BUCKETS,
            F.col(salt_on),
            F.pmod(F.xxhash64("url"), F.lit(SALT_BUCKETS)),
        )
    staging = os.path.join(
        out_dir, run_id, ".staging", f"{stage}-{uuid.uuid4().hex}"
    )
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)
    try:
        os.rename(staging, path)  # atomic claim: exactly one winner
    except OSError:
        # lost the race — a concurrent writer claimed the path first
        shutil.rmtree(staging, ignore_errors=True)
        return _adopt()
    out = spark.read.parquet(path)
    _commit_stage(out, out_dir, run_id, stage, path)
    return out


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str = "run0",
    resume: bool = True,
    with_workflows: bool = False,
) -> dict[str, DataFrame]:
    """pages -> {triples, nodes, edges} materialized under out_dir.

    Stage graph (each stage checkpoint-resumable):
      extract   : per-page text + raw status (shuffle-free)
      triples   : exploded SVO rows with provenance
      linked    : entity-resolved triples (broadcast linking)
      nodes     : canonical entity nodes
      edges     : canonical edges, salted repartition on subj_id

    with_workflows=True persists the workflow layer INTO nodes/edges
    (plans/workflows.py; blarify queries.py:1600-1675): WORKFLOW rows
    plus belongs_to_workflow / workflow_step edges with deterministic
    md5 workflow ids — a consumer of the written tables can query
    workflow membership directly.
    """
    from blarify_spark.plans.canonicalize import canonicalize
    from blarify_spark.plans.extract import (
        extract_all_stage,
        mentions_from,
        triples_from,
    )
    from blarify_spark.plans.linking import resolve_triples
    from blarify_spark.sources.alias import alias_dict

    # Fused extraction: html crosses into Python exactly once per page;
    # every later stage is JVM-only reads of this stage's output.
    extracted = materialize_stage(
        spark,
        out_dir,
        run_id,
        "extract",
        lambda: extract_all_stage(pages).withColumn(
            "warc_date", F.to_date("warc_ts")
        ),
        partition_cols=["lang"],
        resume=resume,
    )

    triples = materialize_stage(
        spark,
        out_dir,
        run_id,
        "triples",
        lambda: triples_from(extracted),
        resume=resume,
    )

    linked = materialize_stage(
        spark,
        out_dir,
        run_id,
        "linked",
        lambda: resolve_triples(
            triples, mentions_from(extracted), alias_dict(spark)
        ),
        resume=resume,
    )

    # canonicalize() yields nodes+edges+mapping together; compute once,
    # stage all three.
    _canon_cache: dict[str, DataFrame] = {}

    def _canon() -> dict[str, DataFrame]:
        if not _canon_cache:
            nodes, edges, mapping = canonicalize(linked)
            if with_workflows:
                from blarify_spark.plans.workflows import (
                    materialize_workflows,
                    workflow_traces,
                )

                # cut lineage first: the traces loop joins the edge plan
                # up to 20x, and the workflow rows re-enter the same
                # tables it was derived from
                nodes = nodes.transform(_cut)
                edges = edges.transform(_cut)
                kg = {"nodes": nodes, "edges": edges}
                nodes, edges = materialize_workflows(
                    nodes, edges, workflow_traces(kg)
                )
            _canon_cache["nodes"] = nodes
            _canon_cache["edges"] = edges
            _canon_cache["mapping"] = mapping
        return _canon_cache

    nodes = materialize_stage(
        spark, out_dir, run_id, "nodes", lambda: _canon()["nodes"], resume=resume
    )
    edges = materialize_stage(
        spark,
        out_dir,
        run_id,
        "edges",
        lambda: _canon()["edges"].select(*TRIPLE_COLS),
        salt_on="subj_id",
        resume=resume,
    )
    # the two tables a FUTURE incremental update consumes (run_incremental):
    # the entity mapping, and per-url ingest digests so classify never
    # re-reads page bytes
    mapping = materialize_stage(
        spark,
        out_dir,
        run_id,
        "mapping",
        lambda: _canon()["mapping"],
        resume=resume,
    )
    from blarify_spark.plans.diff import _content_hash

    digests = materialize_stage(
        spark,
        out_dir,
        run_id,
        "digests",
        lambda: pages.select(
            "url", "warc_ts", _content_hash(pages).alias("content_hash")
        ),
        resume=resume,
    )
    return {
        "triples": triples,
        "linked": linked,
        "nodes": nodes,
        "edges": edges,
        "mapping": mapping,
        "digests": digests,
    }


def run_incremental(
    spark: SparkSession,
    new_pages: DataFrame,
    out_dir: str,
    run_id: str,
    prev_run_id: str,
    resume: bool = True,
) -> dict[str, DataFrame]:
    """Incremental successor to run_pipeline: update a previous run's
    materialized snapshot to `new_pages`, re-extracting only changed
    pages and re-canonicalizing only affected components
    (plans/recanon.py). Writes the same stage set under the new run_id,
    so further updates chain off it.
    """
    from blarify_spark.plans.diff import _content_hash
    from blarify_spark.plans.recanon import incremental_update
    from blarify_spark.plans.workflows import (
        PRED_BELONGS,
        PRED_STEP,
        WORKFLOW_URL_PREFIX,
        materialize_workflows,
        workflow_traces,
    )
    from blarify_spark.sources.alias import alias_dict

    def _prev(stage: str) -> DataFrame:
        if not stage_committed(out_dir, prev_run_id, stage):
            raise FileNotFoundError(
                f"previous run {prev_run_id!r} has no committed {stage!r} "
                f"stage under {out_dir} — run the full pipeline first"
            )
        return spark.read.parquet(os.path.join(out_dir, prev_run_id, stage))

    # A previous run_pipeline(with_workflows=True) persisted the workflow
    # layer INTO nodes/edges. Those rows must NOT pass through the patch
    # untouched (their urls are never in changed_urls, their ids never in
    # the mapping — the layer would go silently stale vs a full rebuild,
    # ADVICE r04): strip them before patching, re-derive from the patched
    # graph after.
    prev_nodes = _prev("nodes")
    prev_edges = _prev("edges").select(*TRIPLE_COLS)
    _is_wf_edge = F.col("url").startswith(WORKFLOW_URL_PREFIX) | F.col(
        "pred"
    ).isin(PRED_BELONGS, PRED_STEP)
    had_workflows = (
        prev_edges.filter(_is_wf_edge).limit(1).count() > 0
    )  # one bounded probe job
    if had_workflows:
        wf_ids = (
            prev_edges.filter(F.col("pred") == PRED_BELONGS)
            .select(F.col("obj_id").alias("canon_id"))
            .distinct()
        )
        prev_nodes = prev_nodes.join(wf_ids, "canon_id", "left_anti")
        prev_edges = prev_edges.filter(~_is_wf_edge)

    out = incremental_update(
        _prev("digests"),  # url + content_hash is all classify needs
        new_pages,
        _prev("linked"),
        prev_nodes,
        prev_edges,
        _prev("mapping"),
        alias_dict(spark),
    )

    # re-materialize the workflow layer from the PATCHED graph so the
    # incremental tables stay equivalent to a full rebuild
    _wf_cache: dict[str, DataFrame] = {}

    def _graph(which: str) -> DataFrame:
        if not had_workflows:
            return out[which] if which == "nodes" else out[which].select(
                *TRIPLE_COLS
            )
        if not _wf_cache:
            n = out["nodes"].transform(_cut)
            e = out["edges"].select(*TRIPLE_COLS).transform(_cut)
            wn, we = materialize_workflows(
                n, e, workflow_traces({"nodes": n, "edges": e})
            )
            _wf_cache["nodes"] = wn
            _wf_cache["edges"] = we
        return _wf_cache[which]

    linked = materialize_stage(
        spark, out_dir, run_id, "linked", lambda: out["triples"], resume=resume
    )
    nodes = materialize_stage(
        spark, out_dir, run_id, "nodes", lambda: _graph("nodes"), resume=resume
    )
    edges = materialize_stage(
        spark,
        out_dir,
        run_id,
        "edges",
        lambda: _graph("edges").select(*TRIPLE_COLS),
        salt_on="subj_id",
        resume=resume,
    )
    mapping = materialize_stage(
        spark, out_dir, run_id, "mapping", lambda: out["mapping"], resume=resume
    )
    digests = materialize_stage(
        spark,
        out_dir,
        run_id,
        "digests",
        lambda: new_pages.select(
            "url", "warc_ts", _content_hash(new_pages).alias("content_hash")
        ),
        resume=resume,
    )
    # crawl-provenance attribution of this ingest session (the blarify
    # integration-layer analog, relationship_creator.py:241-404): which
    # crawl event modified which page-versions (span-attributed) and
    # which entities it affected. crawl_id = run_id, so a consumer joins
    # prov_edges -> prov_nodes to answer "what did ingest X change".
    from blarify_spark.plans.provenance import provenance_tables

    _prov_cache: dict[str, DataFrame] = {}

    def _prov(which: str) -> DataFrame:
        if not _prov_cache:
            pn, pe = provenance_tables(out["changes"], linked, run_id)
            _prov_cache["nodes"] = pn
            _prov_cache["edges"] = pe
        return _prov_cache[which]

    prov_nodes = materialize_stage(
        spark,
        out_dir,
        run_id,
        "prov_nodes",
        lambda: _prov("nodes"),
        resume=resume,
    )
    prov_edges = materialize_stage(
        spark,
        out_dir,
        run_id,
        "prov_edges",
        lambda: _prov("edges"),
        resume=resume,
    )
    # ingest-session chain (PR -> commit INTEGRATION_SEQUENCE analog,
    # relationship_creator.py:217-238): each incremental run extends the
    # previous run's chain, so the batch's crawl history is one ordered
    # table — integration_sequence_edges() renders it as graph edges.
    def _chain() -> DataFrame:
        rows = [(os.path.basename(os.path.normpath(out_dir)), prev_run_id, 0)]
        if stage_committed(out_dir, prev_run_id, "crawl_chain"):
            prior = spark.read.parquet(
                os.path.join(out_dir, prev_run_id, "crawl_chain")
            )
            rows = [
                (r["batch_id"], r["crawl_id"], r["ord"])
                for r in prior.orderBy("ord").collect()  # O(#runs) rows
            ]
        rows.append((rows[0][0], run_id, rows[-1][2] + 1))
        return spark.createDataFrame(
            rows, "batch_id string, crawl_id string, ord int"
        )

    crawl_chain = materialize_stage(
        spark, out_dir, run_id, "crawl_chain", _chain, resume=resume
    )
    # NO "triples" key: run_pipeline's "triples" is the RAW pre-linking
    # stage, which an incremental run never materializes (only changed
    # pages re-extract). Exposing linked under the same name would give
    # the key different semantics per path (ADVICE r03) — consumers read
    # "linked" from both.
    return {
        "linked": linked,
        "nodes": nodes,
        "edges": edges,
        "mapping": mapping,
        "digests": digests,
        "changes": out["changes"],
        "prov_nodes": prov_nodes,
        "prov_edges": prov_edges,
        "crawl_chain": crawl_chain,
    }


# ---------------------------------------------------------------------------
# Idempotent key-based upsert (MERGE INTO analog)
# ---------------------------------------------------------------------------


def upsert_parquet(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    keys: list[str],
) -> DataFrame:
    """Key-based upsert into a parquet table (Iceberg `MERGE INTO` stand-in).

    Existing rows whose key matches an incoming row are replaced; others
    are retained — exactly apoc.merge.node semantics
    (reference: blarify/repositories/graph_db_manager/neo4j_manager.py:128-142)
    expressed as anti-join + union + atomic overwrite. With Iceberg this
    whole function is one `MERGE INTO` statement; the caller contract
    (idempotent re-application) is identical.
    """
    import shutil

    old = path + ".__old__"
    # crash recovery: a previous upsert can die between rename(path, old)
    # and rename(tmp, path), leaving the live path absent while `old`
    # holds the ONLY copy of the table. Restore it before reading —
    # rmtree'ing it here (as a "stray") would silently drop every prior
    # row on the recovery run.
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        keep = existing.join(
            new_rows.select(*keys).dropDuplicates(keys), keys, "left_anti"
        )
        merged = keep.unionByName(new_rows, allowMissingColumns=True)
    else:
        merged = new_rows
    # stage to a tmp dir, rename the live table ASIDE, then rename staging
    # into place. A crash in the tiny window between the two renames leaves
    # the live path absent but `old` intact — the entry guard above
    # restores it on the next run, so no state loses data: either the old
    # table or the new one is always recoverable.
    tmp = path + ".__staging__"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)  # stray dir from a prior crash
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return spark.read.parquet(path)
