"""Document-scoring operators: unigram-LM quality score and BM25
query relevance — the scoring half of a training-data curation
pipeline (KenLM-style quality filters, relevance mining for targeted
corpora).

Cross-engine determinism rules used here:
* stay in EXACT INTEGERS through every aggregation (counts, integer
  sums) and divide only at the very end — a float SUM's value depends
  on reduction order, which differs between engines and between runs;
* where a per-row float is unavoidable (BM25's idf/tf factor), round
  it to fixed precision, scale to an integer (micropoints), and SUM
  the integers — bit-exact under any grouping order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from fink_joiner_spark.operators.text import tokens


def unigram_corpus_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc average corpus unigram probability — the rational-
    arithmetic analog of a unigram LM quality filter (docs made of
    corpus-typical tokens score high; rare-token noise scores low).

    score(d) = (Σ_{t∈d} count(t)) / (|d| · total_tokens), computed
    entirely from integer sums (one exact division at the end).

    Plan: one explode, ONE groupBy(token) for corpus counts (the
    vocabulary — broadcast back, so the corpus side never shuffles for
    the lookup), one groupBy(doc). Vocabulary tables are ~millions of
    rows at web scale: still broadcast-sized; fall back to a keyed
    join if a tokenizer-free corpus pushes it past executor memory.
    """
    ex = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok"))
    freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    per_doc = (
        ex.join(F.broadcast(freq), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").alias("sum_freq"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        "sum_freq",
        (
            F.round(F.col("sum_freq") / (F.col("n_tokens") * F.col("total")), 8)
            + F.lit(0.0)
        ).alias("score"),
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document to a fixed term set — the
    standard retrieval score, used in data curation to mine documents
    relevant to a target domain.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); per-(doc, term)
    contribution idf·tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)). Each
    contribution is rounded to 6 dp and scaled to integer micropoints
    before the per-doc SUM, so the total is independent of reduction
    order; the result is reported as ``score = micropoints / 1e6``.

    Plan: term stats (df) and the corpus scalars (N, avgdl) are
    tiny → broadcast; the corpus side is one scan + one groupBy(doc).
    Emits ``(doc_id, n_terms_matched, score)`` for docs matching ≥1
    query term.
    """
    terms = [t.lower() for t in query_terms]
    term_arr = F.array(*[F.lit(t) for t in terms])
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        F.filter(toks, lambda t: F.array_contains(term_arr, t)).alias("hits"),
    )
    # corpus scalars: N docs, average doc length (exact integers)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # per-(doc, term) term frequency; only matched terms survive
    tf = (
        base.filter(F.size("hits") > 0)
        .select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # document frequency per term (distinct docs containing it)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return _bm25_from_stats(tf, dfreq, stats, k1, b)


def _bm25_from_stats(
    tf: DataFrame, dfreq: DataFrame, stats: DataFrame, k1: float, b: float
) -> DataFrame:
    """Shared BM25 scoring tail: per-(doc, term) tf rows + per-term df
    + corpus scalars → per-doc score. ONE implementation used by both
    the scan-time :func:`bm25_scores` and the persisted-index probe
    :func:`bm25_indexed_scores`, so the micropoint arithmetic (and
    therefore the hash-level result) cannot drift between the two
    paths. ``tf``: (doc_id, dl, term, tf); ``dfreq``: (term, df);
    ``stats``: one row (n_docs, sum_dl) — exact integers all."""
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1
                * (
                    1.0
                    - b
                    + b * F.col("dl") * F.col("n_docs") / F.col("sum_dl")
                )
            ),
        )
        # micropoint integerization: deterministic under any sum order
        .withColumn("micro", F.floor(F.col("contrib") * 1e6 + 0.5).cast("long"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.sum("micro").alias("micro"),
        )
        .select(
            "doc_id",
            "n_terms_matched",
            (F.round(F.col("micro") / 1e6, 6) + F.lit(0.0)).alias("score"),
        )
    )


def build_bm25_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dest_path: str,
    n_buckets: int = 32,
) -> None:
    """Persist a FULL-VOCABULARY BM25 index — the production shape for
    repeated retrieval queries, where re-tokenizing 100 TB per query
    (what :func:`bm25_scores` does) is the dominant cost.

    Layout (three parquet datasets under ``dest_path``):

    * ``postings/`` — (doc_id, dl, term, tf), partitioned by
      ``pb = pmod(xxhash64(term), n_buckets)``. Hash-bucketing the
      TERM (not dictionary-partitioning it) keeps the directory count
      fixed at ``n_buckets`` regardless of vocabulary size (a web
      corpus has ~10^8 terms — one dir per term is catalog poison),
      while still letting a probe for k query terms partition-prune
      to ≤ k buckets. ``dl`` is denormalized into the posting row so
      the probe never touches a corpus-sized doc-stats table.
    * ``terms/`` — (term, df), partitioned the same way.
    * ``meta/`` — one row (n_docs, sum_dl, n_buckets).

    The probe is :func:`bm25_indexed_scores`; both paths share
    :func:`_bm25_from_stats`, so an indexed probe returns bit-identical
    scores to the scan-time operator for the same terms.
    """
    import os

    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        toks.alias("toks"),
    )
    # The three consumers (corpus scalars, postings write, df
    # aggregate) each re-derive tokenize+explode from the scan.
    # MEASURED trade-off (sf0.1, warm): re-derive 2.3 s < persist(tf)
    # 3.4 s < persist(tf)+derived scalars 4.5 s — the passes are
    # embarrassingly parallel and scan+tokenize beats cache
    # serialization (InMemoryRelation also exits codegen). The same
    # constant-factor choice holds at any scale: both shapes are
    # O(corpus); if a deployment's profile ever shows the extra
    # tokenize passes dominating (very expensive tokenizer, slow
    # object store), `tf.persist(DISK_ONLY)` before the writes is the
    # one-line switch.
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        F.lit(n_buckets).alias("n_buckets"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    pb = F.pmod(F.xxhash64("term"), F.lit(n_buckets))
    tf.withColumn("pb", pb).write.mode("overwrite").partitionBy("pb").parquet(
        os.path.join(dest_path, "postings")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dfreq.withColumn("pb", pb).write.mode("overwrite").partitionBy("pb").parquet(
        os.path.join(dest_path, "terms")
    )
    stats.write.mode("overwrite").parquet(os.path.join(dest_path, "meta"))


def update_bm25_index(
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
) -> None:
    """Incrementally fold NEW documents into a persisted BM25 index
    (:func:`build_bm25_index`) — the maintenance path for an append-
    only corpus, where re-tokenizing 100 TB to admit a 0.1% delta is
    the thing a production index exists to avoid. Cost is
    O(delta corpus) + O(term stats of the touched buckets), never
    O(existing corpus):

    * ``postings/`` — delta rows APPEND as new files; existing posting
      files are never rewritten (asserted in ``tests/test_lake.py``).
    * ``terms/`` — per-term df must MERGE (df_new = df_old + df_delta),
      so the delta's buckets are rewritten via DYNAMIC partition
      overwrite: old term rows of the affected buckets (partition-
      pruned read) union the delta, re-aggregated, and only those
      ``pb=`` directories are replaced — untouched buckets keep their
      files.
    * ``meta/`` — corpus scalars re-written with the delta added
      (exact integers; read before overwrite).

    ``new_docs`` must be NEW ids: re-ingesting an already-indexed doc
    would double-count its postings (dedup upstream — this is an
    append log, not an upsert).
    """
    import os

    spark = new_docs.sparkSession
    meta_old = spark.read.parquet(os.path.join(index_path, "meta")).first()
    n_buckets = int(meta_old["n_buckets"])

    toks = tokens(F.col(text_col))
    base = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        toks.alias("toks"),
    )
    # As in build_bm25_index, the consumers re-derive the tokenized tf
    # rather than caching it: measured faster at every reachable scale
    # (the passes parallelize; cache serialization doesn't), same
    # O(delta) either way, and `tf.persist(DISK_ONLY)` remains the
    # one-line switch if a deployment's tokenizer cost flips the
    # constant.
    pb = F.pmod(F.xxhash64("term"), F.lit(n_buckets))
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("pb", pb)
    )
    delta = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).first()
    delta_n_docs = int(delta["n_docs"] or 0)
    delta_sum_dl = int(delta["sum_dl"] or 0)
    tf.write.mode("append").partitionBy("pb").parquet(
        os.path.join(index_path, "postings")
    )

    delta_df = tf.groupBy("pb", "term").agg(F.count(F.lit(1)).alias("df"))
    # affected buckets as literals → the old-terms read partition-prunes
    pbs = [r.pb for r in delta_df.select("pb").distinct().collect()]
    old_terms = (
        spark.read.parquet(os.path.join(index_path, "terms"))
        .where(F.col("pb").isin(pbs))
        .select("term", "df", F.col("pb").cast("long").alias("pb"))
    )
    merged = (
        old_terms.unionByName(delta_df.select("term", "df", "pb"))
        .groupBy("pb", "term")
        .agg(F.sum("df").alias("df"))
        .select("term", "df", "pb")
    )
    old_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("pb").parquet(
            os.path.join(index_path, "terms")
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    new_meta = spark.createDataFrame(
        [
            (
                int(meta_old["n_docs"]) + delta_n_docs,
                int(meta_old["sum_dl"]) + delta_sum_dl,
                n_buckets,
            )
        ],
        "n_docs long, sum_dl long, n_buckets int",
    )
    new_meta.write.mode("overwrite").parquet(os.path.join(index_path, "meta"))


def bm25_index_stream_sink(
    stream_docs: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    checkpoint_location: str,
    trigger_available_now: bool = True,
):
    """Continuous index ingestion: a ``foreachBatch`` sink that folds
    every micro-batch of new documents into a persisted BM25 index via
    :func:`update_bm25_index` — the streaming end of the index
    lifecycle (build → stream-maintain → probe).

    Replay contract: the streaming checkpoint re-runs a batchId after
    a failure, and :func:`update_bm25_index` is NOT idempotent
    (postings append + df merge), so each applied batch drops a marker
    under ``_applied_batches/`` and replays are skipped. The marker is
    keyed by (batchId, CONTENT digest — row count + bit_xor of id
    hashes, order-independent), not batchId alone: a bare-batchId
    marker would also match a legitimately NEW stream attached to the
    same index with a fresh checkpoint (Spark numbers every query's
    batches from 0), silently dropping its documents. With the digest,
    a re-delivery of the same rows skips and new data folds — only a
    redelivery REBATCHED across different boundaries double-folds,
    and a crash MID-update (postings landed, marker didn't)
    re-applies that batch: closing those windows needs an atomically-
    committing table format (Delta/Iceberg MERGE) for the index
    datasets — the documented production upgrade; plain parquet
    cannot express the transactional rename.
    """
    import os

    def fold(batch: DataFrame, batch_id: int) -> None:
        dig = batch.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                f"bit_xor(xxhash64(cast({id_col} as string)))"
            ).alias("h"),  # XOR: order-independent, can't overflow
        ).first()
        if not dig["n"]:
            return
        marker = os.path.join(
            index_path,
            "_applied_batches",
            f"batch={batch_id}_n{dig['n']}_h{dig['h']}",
        )
        if os.path.exists(marker):
            return  # same batch, same content — already folded in
        update_bm25_index(batch, id_col, text_col, index_path)
        os.makedirs(marker, exist_ok=True)

    w = stream_docs.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_location
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w


def compact_bm25_index(spark, index_path: str, target_file_mb: float = 128) -> int:
    """Defragment a streamed-into BM25 index: every
    :func:`update_bm25_index` fold appends new posting files, so after
    N streaming batches each ``pb=`` bucket holds ~N small files and
    probe latency decays into file-open overhead (the classic small-
    files problem). Rewrites ``postings/`` bucket-by-bucket — same
    partition layout, ~``target_file_mb`` files, sorted by ``term``
    within each file so row-group min/max stats prune the ``term IN``
    residual — via one dynamic-partition-overwrite job. Term stats and
    meta are untouched (compaction moves bytes, never counts).
    Returns the number of files requested.

    Production cadence: run it off the maintenance schedule (size- or
    file-count-triggered), exactly like any lake table compaction
    (`lake.compact`). The rewrite lands in a sibling directory and is
    swapped in (Spark refuses — correctly — to overwrite a path it is
    reading); the swap itself is two renames, so as with every plain-
    parquet maintenance here, a concurrent probe during the swap
    window needs the table-format upgrade (Delta/Iceberg) for full
    isolation.
    """
    import math
    import os
    import shutil

    from fink_joiner_spark.operators.lake import dataset_bytes

    postings = os.path.join(index_path, "postings")
    staged = postings + "_compacting"
    retired = postings + "_retired"
    # crash recovery from a previous run, BEFORE any expensive work:
    # a leftover staged dir is an incomplete rewrite (drop it); a
    # leftover retired dir beside a live postings dir is debris from a
    # crash after the swap (drop it); retired WITHOUT postings means
    # the crash hit between the two renames — roll the old data back.
    if os.path.exists(retired) and not os.path.exists(postings):
        os.rename(retired, postings)
    shutil.rmtree(retired, ignore_errors=True)
    shutil.rmtree(staged, ignore_errors=True)

    src = spark.read.parquet(postings)
    n = max(1, math.ceil(dataset_bytes(src) / (target_file_mb * 1024 * 1024)))
    # range-partition on (pb, term): unlike repartition(n, "pb") —
    # which hashes on pb alone and therefore collapses each bucket to
    # ONE output file no matter how big — ranges SPLIT an oversized
    # bucket across several term-contiguous partitions, so the
    # partitionBy write emits ~target-sized, term-sorted files per
    # bucket
    (
        src.repartitionByRange(n, "pb", "term")
        .sortWithinPartitions("pb", "term")
        .write.mode("overwrite")
        .partitionBy("pb")
        .parquet(staged)
    )
    os.rename(postings, retired)
    os.rename(staged, postings)
    shutil.rmtree(retired)
    return n


def bm25_indexed_scores(
    spark,
    index_path: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 scores for ``query_terms`` served from a persisted index
    (:func:`build_bm25_index`) — the probe path never scans the
    corpus: it reads only the ≤ ``len(query_terms)`` postings buckets
    whose partition value matches a query term's hash (partition
    pruning on ``pb``; the ``term IN (...)`` residual then min/max-
    prunes row groups inside them). Bucket ids for the probe literals
    are computed with the SAME engine expression the build used
    (``pmod(xxhash64(term), n_buckets)``), on a ≤ k-row local frame —
    hashing must never be reimplemented driver-side.

    Scores are bit-identical to :func:`bm25_scores` on the source
    corpus (shared :func:`_bm25_from_stats` arithmetic; verified by
    plan audit + hash oracle in the registered query).
    """
    import os

    terms = [t.lower() for t in query_terms]
    meta = spark.read.parquet(os.path.join(index_path, "meta"))
    n_buckets = meta.select("n_buckets").first()[0]
    tlit = spark.createDataFrame([(t,) for t in terms], "term string")
    pbs = [
        r.pb
        for r in tlit.select(
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("pb")
        ).collect()
    ]  # bounded: one scalar per query term
    term_filter = F.col("pb").isin(pbs) & F.col("term").isin(terms)
    tf = spark.read.parquet(os.path.join(index_path, "postings")).where(
        term_filter
    ).select("doc_id", "dl", "term", "tf")
    dfreq = spark.read.parquet(os.path.join(index_path, "terms")).where(
        term_filter
    ).select("term", "df")
    stats = meta.select("n_docs", "sum_dl")
    return _bm25_from_stats(tf, dfreq, stats, k1, b)
