"""Lake maintenance (operators/lake.py) + generic file sources
(sources/batch.py read_files / infer_and_pin).

The pruning claim behind clustered compaction is tested structurally:
after ``compact(cluster_by=...)`` the per-file (min, max) ranges of the
cluster key must not overlap — that non-overlap is exactly what lets
parquet row-group statistics prune a selective scan to few files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fink_joiner_spark.operators import lake
from fink_joiner_spark.sources.batch import infer_and_pin, read_files


def _docs(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_compact_reduces_files_and_preserves_data(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    small = str(tmp_path / "small")
    docs.repartition(16).write.parquet(small)
    assert lake.file_count(spark, small) == 16

    dest = str(tmp_path / "compacted")
    lake.compact(spark.read.parquet(small), dest, target_file_mb=128)
    assert lake.file_count(spark, dest) == 1

    orig = sorted(docs.select("doc_id", "n_chars").collect())
    back = sorted(spark.read.parquet(dest).select("doc_id", "n_chars").collect())
    assert orig == back


def test_clustered_compaction_files_have_disjoint_key_ranges(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    dest = str(tmp_path / "clustered")
    # tiny target so the (sub-MB) test table still splits into >1 file
    lake.compact(docs, dest, target_file_mb=0.05, cluster_by=("doc_id",))
    files = spark.read.parquet(dest).inputFiles()
    assert len(files) > 1

    ranges = []
    for f in files:
        row = (
            spark.read.parquet(f)
            .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
            .collect()[0]
        )
        ranges.append((row.lo, row.hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, f"overlapping file ranges: {ranges}"


def test_read_files_json_csv_orc_roundtrip(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    expected = sorted(docs.collect())
    schema = "doc_id BIGINT, lang STRING, n_chars BIGINT"

    for fmt, write_opts, read_opts in (
        ("json", {}, {}),
        ("csv", {"header": "true"}, {"header": "true"}),
        ("orc", {}, {}),
    ):
        path = str(tmp_path / fmt)
        w = docs.write.format(fmt)
        for k, v in write_opts.items():
            w = w.option(k, v)
        w.save(path)
        back = read_files(spark, path, fmt, schema=schema, **read_opts)
        assert sorted(back.collect()) == expected, fmt


def test_infer_and_pin_bounds_inference_to_sample(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    path = str(tmp_path / "json")
    docs.repartition(8).write.json(path)
    schema = infer_and_pin(spark, path, "json", sample_files=1)
    assert {f.name for f in schema.fields} == {"doc_id", "lang"}
    back = read_files(spark, path, "json", schema=schema)
    assert back.count() == docs.count()


def test_read_files_xml_roundtrip(spark, tmp_path):
    """Spark 4 built-in XML source through the same read_files surface —
    rowTag-delimited records with a pinned schema."""
    from fink_joiner_spark.sources.batch import read_files

    p = tmp_path / "xml"
    p.mkdir()
    (p / "a.xml").write_text(
        "<rows><row><doc_id>1</doc_id><lang>en</lang></row>"
        "<row><doc_id>2</doc_id><lang>fr</lang></row></rows>"
    )
    df = read_files(
        spark, str(p), format="xml", schema="doc_id long, lang string", rowTag="row"
    )
    assert {tuple(r) for r in df.collect()} == {(1, "en"), (2, "fr")}


def test_bm25_index_probe_prunes_and_matches_scan_path(spark, sf_dir, tmp_path):
    """The persisted-index probe must (a) return bit-identical scores
    to the scan-time bm25_scores for the same terms and (b) actually
    restrict its read: under the versioned store the ≤ k probe buckets
    resolve to EXPLICIT directories, so the audit is directory-exact —
    every file the probe's postings frame lists lies inside a probed
    pb= bucket, and the probed bucket count is <= the query term count
    while the index holds many more buckets."""
    import re

    from fink_joiner_spark.operators import scoring

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "bm25_idx")
    scoring.build_bm25_index(docs, "doc_id", "text", idx, n_buckets=32)

    terms = ["join", "filter", "window"]
    probe = scoring.bm25_indexed_scores(spark, idx, terms)
    want = {
        (r.doc_id, r.n_terms_matched, r.score)
        for r in scoring.bm25_scores(docs, "doc_id", "text", terms).collect()
    }
    got = {(r.doc_id, r.n_terms_matched, r.score) for r in probe.collect()}
    assert got == want and got

    # pruning audit: the index has many buckets, the probe reads few
    all_buckets = {
        m.group(1)
        for f in _bm25(spark, idx, "postings").inputFiles()
        for m in [re.search(r"pb=(\d+)", f)]
        if m
    }
    assert len(all_buckets) > 10  # vocabulary spreads over many buckets

    n_buckets = 32
    pbs = {
        int(r.pb)
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("pb"))
        .collect()
    }
    pruned = _bm25(spark, idx, "postings", parts=[f"pb={b}" for b in sorted(pbs)])
    probed = {
        int(re.search(r"pb=(\d+)", f).group(1)) for f in pruned.inputFiles()
    }
    assert probed and len(probed) <= len(terms), (probed, terms)
    assert probed <= pbs


def test_ivf_index_probe_prunes_and_matches_unindexed(spark, sf_dir, tmp_path):
    """The persisted IVF probe must return exactly what topk_ivf
    returns for the same codebook, and must READ only the probed cell
    partitions — under the versioned store the probed cells resolve to
    EXPLICIT directories, so the audit is directory-exact."""
    import os
    import re

    from fink_joiner_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "ivf_idx")
    similarity.build_ivf_index(emb, "vec_id", "embedding", idx, n_cells=16)

    queries = emb.filter(F.col("vec_id") < 2)  # 2 queries, nprobe 2
    got = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, queries, "vec_id", "embedding", k=5, nprobe=2
        ).collect()
    }
    want = {
        tuple(r)
        for r in similarity.topk_ivf(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=5, n_cells=16, nprobe=2,
        ).collect()
    }
    assert got == want and got

    # pruning audit: the probe's versioned read resolves ≤
    # |queries|·nprobe = 4 of the 16 cell partitions to explicit dirs
    all_cells = {
        m.group(1)
        for f in _ivf(spark, idx, "vectors").inputFiles()
        for m in [re.search(r"cell=(\d+)", f)]
        if m
    }
    assert len(all_cells) >= 8  # seeds spread vectors over many cells
    seeds = _ivf(spark, idx, "centroids")
    cells_arr = similarity._cells_arr(seeds)
    probes = (
        queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .crossJoin(F.broadcast(cells_arr))
        .select(F.explode(similarity._nearest_cells(F.col("qvec"), 2)).alias("cell"))
    )
    cell_ids = [r.cell for r in probes.distinct().collect()]
    pruned = _ivf(spark, idx, "vectors", parts=[f"cell={c}" for c in cell_ids])
    read_cells = {
        re.search(r"cell=(\d+)", f).group(1) for f in pruned.inputFiles()
    }
    assert read_cells and len(read_cells) <= 4, (read_cells, all_cells)
    assert read_cells <= {str(c) for c in cell_ids}


def test_bm25_incremental_update_appends_and_matches_full_build(spark, sf_dir, tmp_path):
    """Folding a delta into the index must (a) yield probe scores
    identical to a from-scratch build over the union, (b) APPEND
    postings — every pre-update posting file still present afterwards
    — and (c) leave terms/ buckets untouched by the delta alone."""
    import os

    from fink_joiner_spark.operators import scoring

    docs = _docs(spark, sf_dir)
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)

    inc = str(tmp_path / "inc_idx")
    scoring.build_bm25_index(old, "doc_id", "text", inc, n_buckets=32)
    before = set(_bm25(spark, inc, "postings").inputFiles())
    scoring.update_bm25_index(new, "doc_id", "text", inc)
    after = set(_bm25(spark, inc, "postings").inputFiles())
    assert before <= after and len(after) > len(before)

    full = str(tmp_path / "full_idx")
    scoring.build_bm25_index(docs, "doc_id", "text", full, n_buckets=32)

    terms = ["join", "filter", "window"]
    got = {
        tuple(r)
        for r in scoring.bm25_indexed_scores(spark, inc, terms).collect()
    }
    want = {
        tuple(r)
        for r in scoring.bm25_indexed_scores(spark, full, terms).collect()
    }
    assert got == want and got

    # meta scalars exact
    m_inc = _bm25(spark, inc, "meta").first()
    m_full = _bm25(spark, full, "meta").first()
    assert (m_inc["n_docs"], m_inc["sum_dl"]) == (m_full["n_docs"], m_full["sum_dl"])


def test_bm25_stream_sink_replay_is_noop(spark, sf_dir, tmp_path):
    """Replay contract, both directions: (1) losing the streaming
    checkpoint and re-delivering the SAME batches must not double-fold
    the index (content-digest markers skip them), while (2) a NEW
    stream attached with a fresh checkpoint carrying NEW documents —
    whose batch ids also start at 0 — MUST fold (a bare-batchId marker
    would silently drop it). Final probe equals the full-corpus
    build."""
    import shutil

    from fink_joiner_spark.operators import scoring
    from fink_joiner_spark.sources.streaming import file_drip_feed

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "stream_idx")
    scoring.build_bm25_index(
        docs.where(F.col("doc_id") % 4 == 0), "doc_id", "text", idx, n_buckets=32
    )
    delta1 = docs.where(F.col("doc_id") % 4 == 1).select("doc_id", "text")
    delta2 = docs.where(F.col("doc_id") % 4 >= 2).select("doc_id", "text")

    def run(stage, ckpt):
        stream = (
            spark.readStream.schema(delta1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stage}/f*")
        )
        scoring.bm25_index_stream_sink(
            stream, "doc_id", "text", idx, ckpt
        ).start().awaitTermination()

    stage1 = str(tmp_path / "stage1")
    file_drip_feed(spark, delta1, stage1, "doc_id", n_files=2)
    run(stage1, str(tmp_path / "ckpt1"))
    meta1 = _bm25(spark, idx, "meta").first()

    # (1) full redelivery: fresh checkpoint, same staged files → no-op
    shutil.rmtree(str(tmp_path / "ckpt1"))
    run(stage1, str(tmp_path / "ckpt2"))
    meta2 = _bm25(spark, idx, "meta").first()
    assert (meta1["n_docs"], meta1["sum_dl"]) == (meta2["n_docs"], meta2["sum_dl"])

    # (2) new stream, new docs, fresh checkpoint (batch ids restart at
    # 0) → MUST be folded in, not skipped
    stage2 = str(tmp_path / "stage2")
    file_drip_feed(spark, delta2, stage2, "doc_id", n_files=2)
    run(stage2, str(tmp_path / "ckpt3"))
    meta3 = _bm25(spark, idx, "meta").first()
    assert meta3["n_docs"] > meta2["n_docs"]

    full = str(tmp_path / "full_idx2")
    scoring.build_bm25_index(docs, "doc_id", "text", full, n_buckets=32)
    terms = ["join", "filter", "window"]
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    want = {tuple(r) for r in scoring.bm25_indexed_scores(spark, full, terms).collect()}
    assert got == want and got


def test_bm25_index_compaction_shrinks_files_probe_unchanged(spark, sf_dir, tmp_path):
    """After several incremental folds fragment the postings, compaction
    must cut the file count while leaving probe results bit-identical
    and the partition layout (pb= dirs) intact."""
    import re

    from fink_joiner_spark.operators import scoring

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "frag_idx")
    scoring.build_bm25_index(
        docs.where(F.col("doc_id") % 4 == 0), "doc_id", "text", idx, n_buckets=32
    )
    for rem in (1, 2, 3):  # three folds -> ~4x files per bucket
        scoring.update_bm25_index(
            docs.where(F.col("doc_id") % 4 == rem), "doc_id", "text", idx
        )
    terms = ["join", "filter", "window"]
    before = {
        tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()
    }
    n_files_before = len(_bm25(spark, idx, "postings").inputFiles())

    scoring.compact_bm25_index(spark, idx)

    files_after = _bm25(spark, idx, "postings").inputFiles()
    assert len(files_after) < n_files_before / 2
    assert all(re.search(r"pb=\d+", f) for f in files_after)  # layout kept
    after = {
        tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()
    }
    assert after == before and after


def test_ivf_incremental_update_appends_and_matches_frozen_codebook(spark, sf_dir, tmp_path):
    """Folding delta vectors in must (a) append — no pre-update cell
    file rewritten — and (b) probe identically to running topk_ivf
    over the union with the index's own (frozen) codebook."""
    import os

    from fink_joiner_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "ivf_inc")
    similarity.build_ivf_index(
        emb.where(F.col("vec_id") % 2 == 0), "vec_id", "embedding", idx, n_cells=16
    )
    before = set(_ivf(spark, idx, "vectors").inputFiles())
    similarity.update_ivf_index(
        emb.where(F.col("vec_id") % 2 == 1), "vec_id", "embedding", idx
    )
    after = set(_ivf(spark, idx, "vectors").inputFiles())
    assert before <= after and len(after) > len(before)

    queries = emb.filter(F.col("vec_id") < 4)
    got = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, queries, "vec_id", "embedding", k=5, nprobe=3
        ).collect()
    }
    seeds = _ivf(spark, idx, "centroids")
    want = {
        tuple(r)
        for r in similarity.topk_ivf(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=5, nprobe=3, centroids=seeds,
        ).collect()
    }
    assert got == want and got


def test_bm25_compaction_recovers_from_crash_states(spark, sf_dir, tmp_path, monkeypatch):
    """Under the versioned store a compaction that crashes BEFORE its
    commit leaves the fragmented index fully readable (probe identical
    to pre-op) with only unreferenced staging debris, and re-running
    completes it — no repair protocol, no rename rollback."""
    import pytest

    from fink_joiner_spark.operators import scoring
    from fink_joiner_spark.versioned import VersionedStore

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "crash_idx")
    scoring.build_bm25_index(docs, "doc_id", "text", idx, n_buckets=8)
    terms = ["join", "filter", "window"]
    want = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}

    real_commit = VersionedStore.commit

    def crash_commit(self, version, rows):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(VersionedStore, "commit", crash_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        scoring.compact_bm25_index(spark, idx)
    monkeypatch.setattr(VersionedStore, "commit", real_commit)

    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    assert got == want  # old version untouched
    # r10: a FAILED (not crashed) op aborts — staging dropped, writer
    # lease released immediately, so there is NO debris and the next
    # writer is never TTL-blocked (r9 ADVICE #3)
    assert not scoring.bm25_upsert_pending(spark, idx)

    scoring.compact_bm25_index(spark, idx)  # plain retry completes
    assert not scoring.bm25_upsert_pending(spark, idx)
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    assert got == want


def test_bm25_upsert_matches_rebuild_and_is_idempotent(spark, sf_dir, tmp_path):
    """upsert_bm25_index's contract end-to-end: an index built on a
    STALE corpus (changed text for half the docs — including docs
    whose distinctive tokens disappear entirely — plus missing docs)
    must, after one upsert of the latest versions, probe bit-identical
    to a from-scratch rebuild; a second identical upsert must be a
    no-op (idempotent); meta scalars stay exact throughout."""
    import os

    from fink_joiner_spark.operators import scoring

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "upsert_idx")
    # stale: even ids carry a DIFFERENT token set (every token of the
    # true text deleted, replaced by a marker token unique to the
    # stale version); ids %4==3 missing
    stale = docs.where(F.col("doc_id") % 4 != 3).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("staleonlytoken marker "), F.reverse(F.col("text"))),
        ).otherwise(F.col("text")),
    )
    scoring.build_bm25_index(stale, "doc_id", "text", idx, n_buckets=16)
    # the stale-only token must be probeable before the upsert...
    assert scoring.bm25_indexed_scores(spark, idx, ["staleonlytoken"]).count() > 0

    delta = docs.where(
        (F.col("doc_id") % 2 == 0) | (F.col("doc_id") % 4 == 3)
    ).select("doc_id", "text")
    scoring.upsert_bm25_index(delta, "doc_id", "text", idx)
    # ...and fully retracted after it (deleted-token coverage)
    assert scoring.bm25_indexed_scores(spark, idx, ["staleonlytoken"]).count() == 0
    assert not scoring.bm25_upsert_pending(spark, idx)

    full = str(tmp_path / "rebuild_idx")
    scoring.build_bm25_index(docs, "doc_id", "text", full, n_buckets=16)
    terms = ["join", "filter", "window"]
    want = {tuple(r) for r in scoring.bm25_indexed_scores(spark, full, terms).collect()}
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    assert got == want and got
    m_idx = _bm25(spark, idx, "meta").first()
    m_full = _bm25(spark, full, "meta").first()
    assert (m_idx["n_docs"], m_idx["sum_dl"]) == (m_full["n_docs"], m_full["sum_dl"])

    # double-upsert idempotency: same delta again, nothing may move
    scoring.upsert_bm25_index(delta, "doc_id", "text", idx)
    again = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    assert again == want
    m2 = _bm25(spark, idx, "meta").first()
    assert (m2["n_docs"], m2["sum_dl"]) == (m_full["n_docs"], m_full["sum_dl"])


def test_bm25_legacy_index_probes_but_refuses_maintenance(spark, sf_dir, tmp_path):
    """A LEGACY BM25 index (pre-versioned in-place layout: raw
    postings/terms/meta dirs, no commit log) must still PROBE
    read-only, while update/upsert/delete refuse it loudly — its
    directories have no reader isolation and its forward index is not
    guaranteed complete; the upgrade is a rebuild."""
    import os

    import pytest

    from fink_joiner_spark.operators import scoring
    from fink_joiner_spark.operators.text import tokens as _tokens

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "legacy_idx")
    # manufacture the legacy in-place layout directly
    n_buckets = 8
    toks = _tokens(F.col("text"))
    base = docs.select(
        F.col("doc_id"), F.size(toks).cast("long").alias("dl"), toks.alias("toks")
    )
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("pb", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    tf.write.partitionBy("pb").parquet(f"{idx}/postings")
    tf.groupBy("pb", "term").agg(F.count(F.lit(1)).alias("df")).select(
        "term", "df", "pb"
    ).write.partitionBy("pb").parquet(f"{idx}/terms")
    base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        F.lit(n_buckets).alias("n_buckets"),
    ).write.parquet(f"{idx}/meta")

    terms = ["join", "filter", "window"]
    # probe works read-only on the legacy layout, scores scan-identical
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    want = {
        (r.doc_id, r.n_terms_matched, r.score)
        for r in scoring.bm25_scores(docs, "doc_id", "text", terms).collect()
    }
    assert got == want and got

    delta = docs.limit(3).select("doc_id", "text")
    with pytest.raises(ValueError, match="legacy"):
        scoring.update_bm25_index(delta, "doc_id", "text", idx)
    with pytest.raises(ValueError, match="legacy"):
        scoring.upsert_bm25_index(delta, "doc_id", "text", idx)
    with pytest.raises(ValueError, match="legacy"):
        scoring.delete_from_bm25_index(delta.select("doc_id"), "doc_id", idx)


def test_bm25_upsert_crash_leaves_old_version_readable(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The versioned store's crash contract on the BM25 family: an
    upsert killed AFTER all four staged dataset writes but BEFORE the
    commit marker leaves the previous version fully intact (probe
    answers from the OLD consistent state) and ANY retry is safe —
    the same delta, a different delta, or a delete; re-running the
    original completes it as plain retry, probing identical to a
    from-scratch rebuild."""
    import pytest

    import fink_joiner_spark.operators.scoring as scoring
    from fink_joiner_spark.versioned import VersionedStore

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "crashy_idx")
    stale = docs.where(F.col("doc_id") % 4 != 3).withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0, F.reverse(F.col("text"))).otherwise(
            F.col("text")
        ),
    )
    scoring.build_bm25_index(stale, "doc_id", "text", idx, n_buckets=16)
    delta = docs.where(
        (F.col("doc_id") % 2 == 0) | (F.col("doc_id") % 4 == 3)
    ).select("doc_id", "text")
    terms = ["join", "filter", "window"]
    pre = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}

    real_commit = VersionedStore.commit

    def crash_commit(self, version, rows):
        raise RuntimeError("boom before commit")

    monkeypatch.setattr(VersionedStore, "commit", crash_commit)
    with pytest.raises(RuntimeError):
        scoring.upsert_bm25_index(delta, "doc_id", "text", idx)
    monkeypatch.setattr(VersionedStore, "commit", real_commit)

    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    assert got == pre  # old version intact
    # r10: failed op aborted — no staging debris, lease released
    assert not scoring.bm25_upsert_pending(spark, idx)

    # a DIFFERENT op retries cleanly over the crashed one's debris
    assert scoring.delete_from_bm25_index(
        docs.select((F.col("doc_id") + 9_000_000).alias("doc_id")).limit(1),
        "doc_id", idx,
    ) == 0

    # the original upsert completes as plain retry
    scoring.upsert_bm25_index(delta, "doc_id", "text", idx)
    assert not scoring.bm25_upsert_pending(spark, idx)
    full = str(tmp_path / "rebuild_idx")
    scoring.build_bm25_index(docs, "doc_id", "text", full, n_buckets=16)
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    want = {tuple(r) for r in scoring.bm25_indexed_scores(spark, full, terms).collect()}
    assert got == want and got


def test_ivf_index_compaction_shrinks_files_probe_unchanged(spark, sf_dir, tmp_path):
    """compact_ivf_index (mirror of the BM25 compaction test): after
    repeated incremental folds fragment the cell partitions, compaction
    must cut the file count while keeping the cell= layout and probe
    results bit-identical."""
    import os
    import re

    from fink_joiner_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "ivf_frag")
    similarity.build_ivf_index(
        emb.where(F.col("vec_id") % 4 == 0), "vec_id", "embedding", idx, n_cells=8
    )
    for rem in (1, 2, 3):  # three folds -> ~4x files per cell
        similarity.update_ivf_index(
            emb.where(F.col("vec_id") % 4 == rem), "vec_id", "embedding", idx
        )
    queries = emb.filter(F.col("vec_id") < 4)
    before = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, queries, "vec_id", "embedding", k=5, nprobe=3
        ).collect()
    }
    n_before = len(_ivf(spark, idx, "vectors").inputFiles())

    similarity.compact_ivf_index(spark, idx)

    files_after = _ivf(spark, idx, "vectors").inputFiles()
    assert len(files_after) < n_before / 2
    assert all(re.search(r"cell=[^/]+", f) for f in files_after)  # layout kept
    after = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, queries, "vec_id", "embedding", k=5, nprobe=3
        ).collect()
    }
    assert after == before and after


def test_partition_swap_crash_debris_is_repaired(spark, sf_dir, tmp_path):
    """Crash debris from a partition-scoped swap on a GENERIC
    partitioned lake dataset (`lake.compact_partitioned` — the indexes
    moved to the versioned store, but the in-place swap machinery
    remains a standalone lake op), both windows: a ``pb=N__retired``
    dir WITHOUT a live sibling (crash between the two renames) must be
    rolled back by the repair preamble BEFORE the compaction read;
    WITH a live sibling (post-swap crash) it must be dropped — never
    read as a legitimate string-typed partition."""
    import os
    import shutil

    from fink_joiner_spark.fsutil import HadoopFS, repair_partition_dirs
    from fink_joiner_spark.operators import lake

    docs = _docs(spark, sf_dir)
    data = str(tmp_path / "debris_ds")
    docs.select(
        "doc_id", "n_chars", (F.col("doc_id") % 8).alias("pb")
    ).write.partitionBy("pb").parquet(data)
    want = spark.read.parquet(data).count()
    fs = HadoopFS(spark, data)

    # mid-swap debris: live dir renamed away, not yet replaced
    os.rename(f"{data}/pb=3", f"{data}/pb=3__retired")
    repair_partition_dirs(fs, data)
    assert os.path.exists(f"{data}/pb=3")
    assert not os.path.exists(f"{data}/pb=3__retired")
    assert spark.read.parquet(data).count() == want

    # post-swap debris beside live data: compact_partitioned must drop
    # it BEFORE reading (else stale rows duplicate into the rewrite and
    # the partition column type flips to string)
    shutil.copytree(f"{data}/pb=3", f"{data}/pb=3__retired")
    lake.compact_partitioned(spark, data, "pb", ["doc_id"])
    assert not os.path.exists(f"{data}/pb=3__retired")
    assert spark.read.parquet(data).count() == want
    assert dict(spark.read.parquet(data).dtypes)["pb"] != "string"

    # mid-swap debris is likewise repaired by compaction
    os.rename(f"{data}/pb=5", f"{data}/pb=5__retired")
    lake.compact_partitioned(spark, data, "pb", ["doc_id"])
    assert spark.read.parquet(data).count() == want


def test_index_lifecycle_through_explicit_file_scheme_uris(spark, sf_dir, tmp_path):
    """The FS-API port must resolve EXPLICIT scheme-qualified paths
    through Path.getFileSystem, not driver-local assumptions: a full
    index lifecycle — build, stream-sink markers, upsert swap,
    compaction — driven entirely through ``file:`` URIs, plus
    dataset_bytes sizing a scheme-qualified frame."""
    import os

    from fink_joiner_spark.operators import lake, scoring
    from fink_joiner_spark.sources.streaming import file_drip_feed

    docs = _docs(spark, sf_dir)
    idx = f"file:{tmp_path}/uri_idx"  # explicit scheme everywhere below
    stale = docs.where(F.col("doc_id") % 4 == 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 8 == 0, F.reverse(F.col("text"))).otherwise(
            F.col("text")
        ),
    )
    scoring.build_bm25_index(stale, "doc_id", "text", idx, n_buckets=8)

    # stream-sink markers through the scheme (local stage/ckpt is fine
    # — the marker protocol lives at the INDEX path)
    delta_stream = docs.where(F.col("doc_id") % 4 == 1).select("doc_id", "text")
    stream = file_drip_feed(
        spark, delta_stream, str(tmp_path / "uri_stage"), "doc_id", n_files=2
    )
    scoring.bm25_index_stream_sink(
        stream, "doc_id", "text", idx, str(tmp_path / "uri_ckpt")
    ).start().awaitTermination()
    # applied-batch markers live in the manifest now (atomic with the
    # fold) — resolved through the scheme-qualified store
    from fink_joiner_spark.versioned import VersionedStore

    assert any(
        ds == "_applied" for ds, _, _ in VersionedStore(spark, idx).state_rows()
    )

    # upsert swap through the scheme (retract path: %8==0 docs change)
    delta = docs.where(
        (F.col("doc_id") % 8 == 0) | (F.col("doc_id") % 4 >= 2)
    ).select("doc_id", "text")
    scoring.upsert_bm25_index(delta, "doc_id", "text", idx)

    # compaction through the scheme
    scoring.compact_bm25_index(spark, idx)

    full = str(tmp_path / "uri_full")
    scoring.build_bm25_index(docs, "doc_id", "text", full, n_buckets=8)
    terms = ["join", "filter", "window"]
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    want = {tuple(r) for r in scoring.bm25_indexed_scores(spark, full, terms).collect()}
    assert got == want and got

    # dataset_bytes sizes scheme-qualified files (and equals the
    # unqualified-path sizing of the same dataset)
    via_uri = lake.dataset_bytes(_bm25(spark, idx, "postings"))
    via_path = lake.dataset_bytes(
        _bm25(spark, f"{tmp_path}/uri_idx", "postings")
    )
    assert via_uri == via_path > 0


def test_partition_stats_monitors_real_index_layouts(spark, sf_dir, tmp_path):
    """partition_stats over REAL index layouts: totals must tie out on
    BM25 pb= buckets; on an IVF index a drifted delta (every vector a
    near-duplicate of one corpus vector) must funnel into one cell and
    flip that cell's hot flag — the documented retrain trigger for a
    frozen codebook; n_files must grow with incremental folds (the
    compaction trigger)."""
    import os

    from fink_joiner_spark.operators import lake, scoring, similarity

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "mon_bm25")
    scoring.build_bm25_index(docs, "doc_id", "text", idx, n_buckets=8)
    pstats = lake.partition_stats(
        _bm25(spark, idx, "postings"), "pb", hot_ratio=2.0
    )
    rows = pstats.collect()
    total = _bm25(spark, idx, "postings").count()
    assert sum(r["n_rows"] for r in rows) == total
    assert all(r["n_files"] >= 1 for r in rows)

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ivf = str(tmp_path / "mon_ivf")
    similarity.build_ivf_index(emb, "vec_id", "embedding", ivf, n_cells=8)
    before = {
        r["cell"]: r
        for r in lake.partition_stats(
            _ivf(spark, ivf, "vectors"), "cell", hot_ratio=2.0
        ).collect()
    }

    # drift: a delta of near-duplicates of ONE existing vector — the
    # frozen codebook funnels all of them into that vector's cell
    n_corpus = emb.count()
    anchor = emb.limit(1).select("embedding").first()["embedding"]
    dup = spark.createDataFrame(
        [(n_corpus + i, [v + 1e-6 for v in anchor]) for i in range(2 * n_corpus)],
        "vec_id long, embedding array<float>",
    )
    similarity.update_ivf_index(dup, "vec_id", "embedding", ivf)
    after = lake.partition_stats(
        _ivf(spark, ivf, "vectors"), "cell", hot_ratio=2.0
    ).collect()
    hot = [r for r in after if r["hot"]]
    assert len(hot) == 1, f"expected exactly the drifted cell hot: {after}"
    assert hot[0]["skew_ratio"] > 2.0
    # the fold appended files into the hot cell: n_files grew there
    assert hot[0]["n_files"] > before[hot[0]["cell"]]["n_files"]


def test_ivf_retrain_reassigns_consistently_and_survives_crash(
    spark, sf_dir, tmp_path, monkeypatch
):
    """retrain_ivf_index: after a frozen-codebook drift, retraining
    must (a) leave every stored vector's cell equal to the argmax
    against the NEW codebook, (b) keep the all-cell probe exactly
    brute force, and (c) under the versioned store, a crash BEFORE the
    commit marker leaves the previous version fully intact — the
    probe still answers from the OLD consistent state (no mixed
    vectors/codebook window at all) and re-running is plain retry."""
    import os

    import pytest

    import fink_joiner_spark.operators.similarity as similarity
    from fink_joiner_spark.versioned import VersionedStore

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "retrain_idx")
    similarity.build_ivf_index(
        emb.where(F.col("vec_id") % 2 == 0), "vec_id", "embedding", idx, n_cells=8
    )
    similarity.update_ivf_index(
        emb.where(F.col("vec_id") % 2 == 1), "vec_id", "embedding", idx
    )

    def assert_consistent():
        seeds = _ivf(spark, idx, "centroids")
        cell_type = dict(seeds.dtypes)["cell_id"]
        vecs = _ivf(spark, idx, "vectors").select(
            "nid", "nvec", F.col("cell").cast(cell_type).alias("cell")
        )
        recomputed = vecs.crossJoin(
            F.broadcast(similarity._cells_arr(seeds))
        ).select(
            "nid",
            "cell",
            F.element_at(
                similarity._nearest_cells(F.col("nvec"), 1), 1
            ).alias("want"),
        )
        assert recomputed.filter(F.col("cell") != F.col("want")).count() == 0

    queries = emb.filter(F.col("vec_id") < 4)

    def probe():
        return {
            tuple(r)
            for r in similarity.topk_ivf_indexed(
                spark, idx, queries, "vec_id", "embedding", k=5, nprobe=8
            ).collect()
        }

    pre_crash = probe()

    # crash BEFORE the commit marker: all staged writes done, nothing visible
    real_commit = VersionedStore.commit

    def crash_commit(self, version, rows):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(VersionedStore, "commit", crash_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        similarity.retrain_ivf_index(spark, idx, train_iters=2)
    monkeypatch.setattr(VersionedStore, "commit", real_commit)

    # the OLD version is fully readable and self-consistent — snapshot
    # isolation means there was never a mixed state to repair
    assert probe() == pre_crash
    assert_consistent()
    # r10: failed op aborted — no staging debris, lease released
    assert not similarity.ivf_retrain_pending(spark, idx)

    # re-run is plain retry: deterministic from the (invariant) vector set
    similarity.retrain_ivf_index(spark, idx, train_iters=2)
    assert not similarity.ivf_retrain_pending(spark, idx)
    assert_consistent()
    _fwd_consistent(spark, idx)
    # trained codebook: 8 cells keyed 0..7
    seeds = _ivf(spark, idx, "centroids")
    assert sorted(r["cell_id"] for r in seeds.collect()) == list(range(8))

    # all-cell probe == brute force over the same corpus
    got = probe()
    want = {
        tuple(r)
        for r in similarity.topk_bruteforce(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding", k=5
        ).collect()
    }
    assert got == want and got


def test_bm25_compaction_defragments_forward_index_too(spark, sf_dir, tmp_path):
    """docs/ is append-maintained like postings/ and fragments the same
    way; compaction must shrink its file count, keep the db= layout,
    and leave a subsequent UPSERT (the forward index's whole purpose)
    bit-correct."""
    import re

    from fink_joiner_spark.operators import scoring

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "fwd_frag")
    stale_text = F.when(
        F.col("doc_id") % 2 == 0, F.reverse(F.col("text"))
    ).otherwise(F.col("text"))
    scoring.build_bm25_index(
        docs.where(F.col("doc_id") % 4 == 0).withColumn("text", stale_text),
        "doc_id", "text", idx, n_buckets=8,
    )
    for rem in (1, 2, 3):
        scoring.update_bm25_index(
            docs.where(F.col("doc_id") % 4 == rem).withColumn("text", stale_text),
            "doc_id", "text", idx,
        )
    n_before = len(_bm25(spark, idx, "docs").inputFiles())
    scoring.compact_bm25_index(spark, idx)
    files_after = _bm25(spark, idx, "docs").inputFiles()
    assert len(files_after) < n_before / 2
    assert all(re.search(r"db=\d+", f) for f in files_after)

    # the compacted forward index still drives an exact upsert
    scoring.upsert_bm25_index(
        docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text"),
        "doc_id", "text", idx,
    )
    full = str(tmp_path / "fwd_full")
    scoring.build_bm25_index(docs, "doc_id", "text", full, n_buckets=8)
    terms = ["join", "filter", "window"]
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    want = {tuple(r) for r in scoring.bm25_indexed_scores(spark, full, terms).collect()}
    assert got == want and got


def test_bm25_delete_matches_clean_rebuild_and_retires_buckets(
    spark, sf_dir, tmp_path, monkeypatch
):
    """delete_from_bm25_index: after deleting the junk half, the probe
    must be bit-identical to an index the junk never entered; a term
    living ONLY in deleted docs must vanish; re-deleting is a no-op;
    meta shrinks exactly; and a crash BEFORE the commit leaves the
    dirty index fully readable, completed by plain retry."""
    import pytest

    import fink_joiner_spark.operators.scoring as scoring
    from fink_joiner_spark.versioned import VersionedStore

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "del_idx")
    junk = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("junkonlytoken "), F.reverse(F.col("text"))).alias("text"),
    )
    dirty = docs.select("doc_id", "text").unionByName(junk)
    scoring.build_bm25_index(dirty, "doc_id", "text", idx, n_buckets=16)
    assert scoring.bm25_indexed_scores(spark, idx, ["junkonlytoken"]).count() > 0

    # crash before commit: nothing applied, probe unchanged
    real_commit = VersionedStore.commit

    def crash_commit(self, version, rows):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(VersionedStore, "commit", crash_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        scoring.delete_from_bm25_index(junk.select("doc_id"), "doc_id", idx)
    monkeypatch.setattr(VersionedStore, "commit", real_commit)
    assert scoring.bm25_indexed_scores(spark, idx, ["junkonlytoken"]).count() > 0
    # r10: failed op aborted — no staging debris, lease released
    assert not scoring.bm25_upsert_pending(spark, idx)

    n = scoring.delete_from_bm25_index(junk.select("doc_id"), "doc_id", idx)
    assert n == junk.count()
    assert not scoring.bm25_upsert_pending(spark, idx)
    # the junk-only term is fully retracted
    assert scoring.bm25_indexed_scores(spark, idx, ["junkonlytoken"]).count() == 0

    clean = str(tmp_path / "clean_idx")
    scoring.build_bm25_index(
        docs.select("doc_id", "text"), "doc_id", "text", clean, n_buckets=16
    )
    terms = ["join", "filter", "window"]
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    want = {tuple(r) for r in scoring.bm25_indexed_scores(spark, clean, terms).collect()}
    assert got == want and got
    m_idx = _bm25(spark, idx, "meta").first()
    m_clean = _bm25(spark, clean, "meta").first()
    assert (m_idx["n_docs"], m_idx["sum_dl"]) == (m_clean["n_docs"], m_clean["sum_dl"])

    # idempotent: deleting already-gone ids is a zero no-op
    assert scoring.delete_from_bm25_index(junk.select("doc_id"), "doc_id", idx) == 0
    again = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    assert again == want


def test_ivf_delete_rewrites_only_affected_cells(spark, sf_dir, tmp_path):
    """delete_from_ivf_index must (a) leave probe results identical to
    an index the junk never entered (same codebook), (b) rewrite ONLY
    the affected cell partitions — untouched cells carry their version
    REFERENCES forward, so their physical files are identical — (c)
    drop a cell whose every vector is deleted out of the manifest, and
    (d) treat absent ids as a zero no-op."""
    import os

    from fink_joiner_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "ivf_del")
    junk = emb.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.reverse(F.col("embedding")).alias("embedding"),
    )
    dirty = emb.select("vec_id", "embedding").unionByName(junk)
    similarity.build_ivf_index(dirty, "vec_id", "embedding", idx, n_cells=8)

    before_files = set(_ivf(spark, idx, "vectors").inputFiles())
    junk_cells = {
        str(r.cell)
        for r in _ivf(spark, idx, "vectors")
        .join(junk.select(F.col("vec_id").alias("nid")), "nid", "semi")
        .select("cell").distinct().collect()
    }
    n = similarity.delete_from_ivf_index(junk.select("vec_id"), "vec_id", idx)
    assert n == junk.count()

    after_files = set(_ivf(spark, idx, "vectors").inputFiles())
    untouched = {
        f for f in before_files
        if not any(f"cell={c}/" in f or f"cell={c}%" in f for c in junk_cells)
    }
    assert untouched <= after_files  # same files, byte-for-byte same paths
    _fwd_consistent(spark, idx)

    # probe == index built without the junk, same (frozen) codebook
    queries = emb.filter(F.col("vec_id") < 4)
    seeds = _ivf(spark, idx, "centroids")
    got = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, queries, "vec_id", "embedding", k=5, nprobe=8
        ).collect()
    }
    want = {
        tuple(r)
        for r in similarity.topk_ivf(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=5, nprobe=8, n_cells=8, centroids=seeds,
        ).collect()
    }
    assert got == want and got

    # absent ids: zero no-op
    assert similarity.delete_from_ivf_index(
        junk.select("vec_id"), "vec_id", idx
    ) == 0

    # retire-a-whole-cell: delete every remaining vector of one cell
    some_cell = sorted(
        str(r.cell) for r in _ivf(spark, idx, "vectors")
        .select("cell").distinct().collect()
    )[0]
    victims = (
        _ivf(spark, idx, "vectors")
        .where(F.col("cell").cast("string") == some_cell)
        .select(F.col("nid").alias("vec_id"))
    )
    n_victims = victims.count()
    assert similarity.delete_from_ivf_index(victims, "vec_id", idx) == n_victims
    remaining_cells = {
        str(r.cell) for r in _ivf(spark, idx, "vectors")
        .select("cell").distinct().collect()
    }
    assert some_cell not in remaining_cells


def test_ivf_stream_sink_replay_is_noop(spark, sf_dir, tmp_path):
    """IVF streaming ingestion replay contract (mirror of the BM25
    sink test): re-delivering the same staged files under a fresh
    checkpoint must not double-fold (content-digest markers), while a
    new stream with NEW vectors — batch ids restarting at 0 — must
    fold; the drained index probes identically to topk_ivf over the
    union with the frozen codebook."""
    import os
    import shutil

    from fink_joiner_spark.operators import similarity
    from fink_joiner_spark.sources.streaming import file_drip_feed

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "ivf_stream")
    similarity.build_ivf_index(
        emb.where(F.col("vec_id") % 4 == 0), "vec_id", "embedding", idx, n_cells=8
    )
    d1 = emb.where(F.col("vec_id") % 4 == 1).select("vec_id", "embedding")
    d2 = emb.where(F.col("vec_id") % 4 >= 2).select("vec_id", "embedding")

    def run(stage, ckpt):
        stream = (
            spark.readStream.schema(d1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stage}/f*")
        )
        similarity.ivf_index_stream_sink(
            stream, "vec_id", "embedding", idx, ckpt
        ).start().awaitTermination()

    stage1 = str(tmp_path / "s1")
    file_drip_feed(spark, d1, stage1, "vec_id", n_files=2)
    run(stage1, str(tmp_path / "c1"))
    n1 = _ivf(spark, idx, "vectors").count()

    # full redelivery, fresh checkpoint -> no-op
    shutil.rmtree(str(tmp_path / "c1"))
    run(stage1, str(tmp_path / "c2"))
    assert _ivf(spark, idx, "vectors").count() == n1

    # new stream, new vectors, fresh checkpoint -> must fold
    stage2 = str(tmp_path / "s2")
    file_drip_feed(spark, d2, stage2, "vec_id", n_files=2)
    run(stage2, str(tmp_path / "c3"))
    assert _ivf(spark, idx, "vectors").count() > n1

    queries = emb.filter(F.col("vec_id") < 4)
    seeds = _ivf(spark, idx, "centroids")
    got = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, queries, "vec_id", "embedding", k=5, nprobe=8
        ).collect()
    }
    want = {
        tuple(r)
        for r in similarity.topk_ivf(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=5, nprobe=8, n_cells=8, centroids=seeds,
        ).collect()
    }
    assert got == want and got


def test_upsert_rewrites_only_affected_buckets(spark, sf_dir, tmp_path):
    """The O(delta + touched buckets) claim, pinned structurally: after
    an upsert whose delta terms hash into a known bucket set, every
    postings file in an UNAFFECTED pb= bucket must still be the exact
    same physical file (its manifest reference carried forward — no
    rewrite, no move), and likewise for unaffected db= forward-index
    buckets."""
    import re

    from fink_joiner_spark.operators import scoring

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "scope_idx")
    scoring.build_bm25_index(docs, "doc_id", "text", idx, n_buckets=32)
    before_p = set(_bm25(spark, idx, "postings").inputFiles())
    before_d = set(_bm25(spark, idx, "docs").inputFiles())

    # a 3-doc delta: tiny term set -> few affected buckets
    delta = docs.where(F.col("doc_id").isin([1, 2, 3])).select(
        "doc_id", F.lit("alpha beta gamma").alias("text")
    )
    scoring.upsert_bm25_index(delta, "doc_id", "text", idx)

    n_buckets = 32
    new_pbs = {
        r.pb
        for r in spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",)], "term string"
        ).select(F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("pb")).collect()
    }
    old_pbs = {
        r.pb
        for r in _bm25(spark, idx, "docs")
        .where(F.col("doc_id").isin([1, 2, 3]))
        .select(F.explode("pbs").alias("pb")).distinct().collect()
    }
    after_p = set(_bm25(spark, idx, "postings").inputFiles())
    changed_buckets = set()
    for f in before_p.symmetric_difference(after_p):
        m = re.search(r"pb=(\d+)", f)
        if m:
            changed_buckets.add(int(m.group(1)))
    assert new_pbs <= changed_buckets | old_pbs  # new terms landed
    untouched_p = {
        f for f in before_p
        if int(re.search(r"pb=(\d+)", f).group(1)) not in changed_buckets
    }
    assert untouched_p <= after_p  # same files, byte-for-byte same paths
    # forward index: only the 3 ids' db buckets may change
    dbs = {
        r.db
        for r in spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
        .select(
            F.pmod(
                F.xxhash64(F.col("doc_id").cast("string")), F.lit(n_buckets)
            ).alias("db")
        ).collect()
    }
    after_d = set(_bm25(spark, idx, "docs").inputFiles())
    for f in before_d.symmetric_difference(after_d):
        m = re.search(r"db=(\d+)", f)
        assert m and int(m.group(1)) in dbs, f"unaffected db bucket rewritten: {f}"


def test_bm25_probe_is_isolated_from_concurrent_maintenance(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Reader snapshot isolation on the BM25 family (mirror of the IVF
    test): a probe injected at the most hostile interleaving point —
    all four staged datasets written, commit not flipped — must equal
    the pre-op result exactly (never new postings with old term stats
    or a half-swapped bucket set); after the flip the complete new
    state; and an op interrupted there is completed or superseded by
    ANY retry with no repair protocol."""
    import pytest

    import fink_joiner_spark.operators.scoring as scoring
    from fink_joiner_spark.versioned import VersionedStore

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "interleave_idx")
    scoring.build_bm25_index(docs, "doc_id", "text", idx, n_buckets=8)

    terms = ["join", "filter", "window"]

    def probe():
        return {
            tuple(r)
            for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()
        }

    pre = probe()
    delta = docs.where(F.col("doc_id") < 20).select(
        "doc_id", F.lit("replacement text").alias("text")
    )
    mid_op_probes = []
    real_commit = VersionedStore.commit

    def probing_commit(self, version, rows):
        mid_op_probes.append(probe())
        return real_commit(self, version, rows)

    monkeypatch.setattr(VersionedStore, "commit", probing_commit)
    scoring.upsert_bm25_index(delta, "doc_id", "text", idx)
    monkeypatch.setattr(VersionedStore, "commit", real_commit)
    assert mid_op_probes and all(p_ == pre for p_ in mid_op_probes)

    # post-commit: replaced docs no longer match the original terms
    post = probe()
    assert post != pre
    assert scoring.bm25_indexed_scores(spark, idx, ["replacement"]).count() == 20

    # a delete of the same ids right after works (no interleave gate)
    assert scoring.delete_from_bm25_index(
        delta.select("doc_id"), "doc_id", idx
    ) == delta.count()
    assert scoring.bm25_indexed_scores(spark, idx, ["replacement"]).count() == 0


class _MetaShim:
    """Meta scalars live in the manifest's ``_meta`` annotation now;
    this keeps the historical ``.first()[key]`` test idiom working."""

    def __init__(self, obj):
        self._obj = obj

    def first(self):
        return self._obj


def _index_dataset(spark, idx, dataset, parts=None):
    import json

    from fink_joiner_spark.versioned import VersionedStore

    store = VersionedStore(spark, idx)
    if dataset == "meta":
        return _MetaShim(json.loads(store.annotation("_meta")))
    return store.read(dataset, parts)


def _ivf(spark, idx, dataset, parts=None):
    """Current committed version of an IVF index dataset."""
    return _index_dataset(spark, idx, dataset, parts)


def _bm25(spark, idx, dataset, parts=None):
    """Current committed version of a BM25 index dataset."""
    return _index_dataset(spark, idx, dataset, parts)


def _fwd_consistent(spark, idx: str) -> None:
    """The ids forward map must mirror vectors exactly: same (nid,
    cell) set (cells compared as strings — the map's storage type)."""
    vec = {
        (r.nid, str(r.cell))
        for r in _ivf(spark, idx, "vectors").select("nid", "cell").collect()
    }
    fwd = {
        (r.nid, r.cell)
        for r in _ivf(spark, idx, "ids").select("nid", "cell").collect()
    }
    assert vec == fwd and vec


def test_ivf_upsert_matches_rebuild_and_is_idempotent(spark, sf_dir, tmp_path):
    """upsert_ivf_index end-to-end (IVF CRUD parity with the BM25
    side): an index built on STALE vectors (changed embeddings for
    half the ids, a quarter of ids missing) must, after one upsert of
    the latest versions, probe bit-identical to the same frozen
    codebook over the latest corpus — never the double-indexed
    both-versions state a plain append leaves; a second identical
    upsert is a no-op; the forward map stays consistent throughout;
    an all-new-ids delta degrades to the append fast-path."""
    import os

    from fink_joiner_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "ivf_upsert")
    stale = emb.where(F.col("vec_id") % 4 != 3).select(
        "vec_id",
        F.when(
            F.col("vec_id") % 2 == 0, F.reverse(F.col("embedding"))
        ).otherwise(F.col("embedding")).alias("embedding"),
    )
    similarity.build_ivf_index(stale, "vec_id", "embedding", idx, n_cells=8)

    delta = emb.where(
        (F.col("vec_id") % 2 == 0) | (F.col("vec_id") % 4 == 3)
    ).select("vec_id", "embedding")
    similarity.upsert_ivf_index(delta, "vec_id", "embedding", idx)
    assert not similarity.ivf_maint_pending(spark, idx)
    _fwd_consistent(spark, idx)

    # no double-indexing: exactly one row per id
    n_ids = _ivf(spark, idx, "vectors").select("nid").distinct().count()
    n_rows = _ivf(spark, idx, "vectors").count()
    assert n_ids == n_rows == emb.count()

    # probe == the same frozen codebook over the latest corpus
    queries = emb.filter(F.col("vec_id") < 4)
    seeds = _ivf(spark, idx, "centroids")
    got = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, queries, "vec_id", "embedding", k=5, nprobe=8
        ).collect()
    }
    want = {
        tuple(r)
        for r in similarity.topk_ivf(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=5, nprobe=8, n_cells=8, centroids=seeds,
        ).collect()
    }
    assert got == want and got

    # idempotent: same delta again, nothing moves
    similarity.upsert_ivf_index(delta, "vec_id", "embedding", idx)
    again = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, queries, "vec_id", "embedding", k=5, nprobe=8
        ).collect()
    }
    assert again == want
    _fwd_consistent(spark, idx)

    # all-new ids: append fast-path (existing files untouched)
    before = set(_ivf(spark, idx, "vectors").inputFiles())
    fresh = emb.limit(5).select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding"
    )
    similarity.upsert_ivf_index(fresh, "vec_id", "embedding", idx)
    after = set(_ivf(spark, idx, "vectors").inputFiles())
    assert before <= after and len(after) > len(before)
    _fwd_consistent(spark, idx)


def test_ivf_upsert_delete_refuse_pre_forward_map_index(spark, sf_dir, tmp_path):
    """A LEGACY index (pre-versioned in-place layout: raw vectors/ +
    centroids/ dirs, no commit log, no forward map) must be refused
    LOUDLY by update/upsert/delete — proceeding would either
    double-index or cost a full-index membership scan per call — while
    the probe still serves it (read-only fallback), and
    retrain_ivf_index must UPGRADE it in place (it reads every vector
    anyway), after which the full maintenance surface works."""
    import os

    import pytest

    from fink_joiner_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "legacy_ivf")
    # manufacture the legacy layout: raw in-place dirs, no commit log
    c = similarity._spread(emb).select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("nvec")
    )
    seeds = similarity._seed_centroids(c, 8)
    cells_arr = similarity._cells_arr(seeds)
    assigned = c.crossJoin(F.broadcast(cells_arr)).select(
        "nid", "nvec",
        F.element_at(similarity._nearest_cells(F.col("nvec"), 1), 1).alias("cell"),
    )
    assigned.write.partitionBy("cell").parquet(f"{idx}/vectors")
    seeds.write.parquet(f"{idx}/centroids")

    # probe works read-only on the legacy layout
    queries = emb.filter(F.col("vec_id") < 4)
    legacy_probe = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, queries, "vec_id", "embedding", k=5, nprobe=8
        ).collect()
    }
    assert legacy_probe

    delta = emb.limit(3).select("vec_id", "embedding")
    with pytest.raises(ValueError, match="legacy"):
        similarity.upsert_ivf_index(delta, "vec_id", "embedding", idx)
    with pytest.raises(ValueError, match="legacy"):
        similarity.delete_from_ivf_index(delta.select("vec_id"), "vec_id", idx)
    with pytest.raises(ValueError, match="legacy"):
        similarity.update_ivf_index(delta, "vec_id", "embedding", idx)

    similarity.retrain_ivf_index(spark, idx)  # free in-place upgrade
    _fwd_consistent(spark, idx)
    assert not os.path.exists(f"{idx}/vectors")  # legacy dirs cleaned
    assert int(_ivf(spark, idx, "meta").first()["n_cells"]) == 8
    assert similarity.delete_from_ivf_index(
        delta.select("vec_id"), "vec_id", idx
    ) == 3
    _fwd_consistent(spark, idx)


def test_ivf_maintenance_crash_leaves_old_version_readable(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The versioned store's crash contract (replaces the old
    intent-marker protocol): an upsert killed AFTER all its dataset
    writes but BEFORE the commit marker leaves the previous version
    fully intact — the probe answers from the OLD consistent state —
    and ANY retry is safe: the same delta, a different delta, or a
    delete; no repair step, no refusal, no half-applied state."""
    import os

    import pytest

    import fink_joiner_spark.operators.similarity as similarity
    from fink_joiner_spark.versioned import VersionedStore

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "ivf_crashy")
    stale = emb.where(F.col("vec_id") % 4 != 3).select(
        "vec_id",
        F.when(
            F.col("vec_id") % 2 == 0, F.reverse(F.col("embedding"))
        ).otherwise(F.col("embedding")).alias("embedding"),
    )
    similarity.build_ivf_index(stale, "vec_id", "embedding", idx, n_cells=8)
    delta = emb.where(
        (F.col("vec_id") % 2 == 0) | (F.col("vec_id") % 4 == 3)
    ).select("vec_id", "embedding")

    queries = emb.filter(F.col("vec_id") < 4)

    def probe():
        return {
            tuple(r)
            for r in similarity.topk_ivf_indexed(
                spark, idx, queries, "vec_id", "embedding", k=5, nprobe=8
            ).collect()
        }

    pre = probe()
    real_commit = VersionedStore.commit

    def crash_commit(self, version, rows):
        raise RuntimeError("boom before commit")

    monkeypatch.setattr(VersionedStore, "commit", crash_commit)
    with pytest.raises(RuntimeError):
        similarity.upsert_ivf_index(delta, "vec_id", "embedding", idx)
    monkeypatch.setattr(VersionedStore, "commit", real_commit)

    # old version intact and consistent; the failed op aborted its
    # staging (r10): no debris, lease released immediately
    assert probe() == pre
    assert not similarity.ivf_maint_pending(spark, idx)
    _fwd_consistent(spark, idx)

    # a DIFFERENT op retries cleanly over the crashed one's debris
    junk_del = emb.limit(1).select((F.col("vec_id") + 9_000_000).alias("vec_id"))
    assert similarity.delete_from_ivf_index(junk_del, "vec_id", idx) == 0

    # and the original upsert completes as plain retry
    similarity.upsert_ivf_index(delta, "vec_id", "embedding", idx)
    assert not similarity.ivf_maint_pending(spark, idx)
    _fwd_consistent(spark, idx)
    seeds = _ivf(spark, idx, "centroids")
    got = probe()
    want = {
        tuple(r)
        for r in similarity.topk_ivf(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=5, nprobe=8, n_cells=8, centroids=seeds,
        ).collect()
    }
    assert got == want and got


def test_ivf_probe_is_isolated_from_concurrent_maintenance(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Reader snapshot isolation, the round-8 verdict's ask #4 pinned
    end-to-end: a probe injected at EVERY interleaving point of a
    maintenance op — after each staged dataset write and right before
    the commit flip — must equal the pre-op result exactly (one
    consistent version, never vectors without their forward rows or a
    mixed old/new cell set); a probe after the flip sees the complete
    new state; and a probe frame RESOLVED pre-op is still collectable
    post-op (GC retains the previous commit's directories)."""
    import os

    import fink_joiner_spark.operators.similarity as similarity
    from fink_joiner_spark.versioned import VersionedStore

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "ivf_iso")
    stale = emb.where(F.col("vec_id") % 4 != 3).select(
        "vec_id",
        F.when(
            F.col("vec_id") % 2 == 0, F.reverse(F.col("embedding"))
        ).otherwise(F.col("embedding")).alias("embedding"),
    )
    similarity.build_ivf_index(stale, "vec_id", "embedding", idx, n_cells=8)
    delta = emb.where(
        (F.col("vec_id") % 2 == 0) | (F.col("vec_id") % 4 == 3)
    ).select("vec_id", "embedding")

    queries = emb.filter(F.col("vec_id") < 4)

    def probe():
        return {
            tuple(r)
            for r in similarity.topk_ivf_indexed(
                spark, idx, queries, "vec_id", "embedding", k=5, nprobe=8
            ).collect()
        }

    pre = probe()
    # a long-running reader that RESOLVED its plan before the op
    pre_resolved = _ivf(spark, idx, "vectors")

    mid_op_probes = []
    real_commit = VersionedStore.commit

    def probing_commit(self, version, rows):
        # every staged write is on disk at this point — the most
        # hostile interleaving for an in-place layout
        mid_op_probes.append(probe())
        return real_commit(self, version, rows)

    monkeypatch.setattr(VersionedStore, "commit", probing_commit)
    similarity.upsert_ivf_index(delta, "vec_id", "embedding", idx)
    monkeypatch.setattr(VersionedStore, "commit", real_commit)

    assert mid_op_probes and all(p == pre for p in mid_op_probes)

    # post-commit: the complete new state
    seeds = _ivf(spark, idx, "centroids")
    want = {
        tuple(r)
        for r in similarity.topk_ivf(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=5, nprobe=8, n_cells=8, centroids=seeds,
        ).collect()
    }
    assert probe() == want

    # the pre-op reader still collects (previous commit's dirs retained)
    assert pre_resolved.count() > 0


def test_ivf_delete_membership_prunes_to_delta_db_buckets(spark, sf_dir, tmp_path):
    """The forward-map payoff, pinned structurally: after a tiny
    delete, (a) every ids file in a db= bucket NOT hit by the delta
    ids' hashes is the exact same physical file (reference carried
    forward), (b) every vectors file in an unaffected cell keeps its
    path, and (c) the membership read resolves to ONLY the delta's
    db= directories — under the versioned store the restriction is
    directory-exact, stronger than partition pruning."""
    import os
    import re

    from fink_joiner_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "ivf_prune")
    similarity.build_ivf_index(emb, "vec_id", "embedding", idx, n_cells=8)
    before_ids = set(_ivf(spark, idx, "ids").inputFiles())
    before_vec = set(_ivf(spark, idx, "vectors").inputFiles())

    victims = [int(r.vec_id) for r in emb.limit(2).select("vec_id").collect()]
    n_fwd = int(_ivf(spark, idx, "meta").first()["n_fwd_buckets"])
    dbs = {
        int(r.db)
        for r in spark.createDataFrame([(v,) for v in victims], "vec_id long")
        .select(
            F.pmod(
                F.xxhash64(F.col("vec_id").cast("string")), F.lit(n_fwd)
            ).alias("db")
        ).collect()
    }
    cells = {
        str(r.cell)
        for r in _ivf(spark, idx, "ids")
        .where(F.col("nid").isin(victims)).select("cell").collect()
    }

    # (c) the membership read resolves to exactly the delta's db= dirs
    membership = _ivf(spark, idx, "ids", parts=[f"db={d}" for d in sorted(dbs)])
    read_dbs = {
        int(re.search(r"db=(\d+)", f).group(1)) for f in membership.inputFiles()
    }
    assert read_dbs <= dbs and read_dbs

    n = similarity.delete_from_ivf_index(
        spark.createDataFrame([(v,) for v in victims], "vec_id long"),
        "vec_id", idx,
    )
    assert n == len(victims)

    after_ids = set(_ivf(spark, idx, "ids").inputFiles())
    for f in before_ids.symmetric_difference(after_ids):
        m = re.search(r"db=(\d+)", f)
        assert m and int(m.group(1)) in dbs, f"unaffected db bucket rewritten: {f}"
    after_vec = set(_ivf(spark, idx, "vectors").inputFiles())
    for f in before_vec.symmetric_difference(after_vec):
        m = re.search(r"cell=([^/]+)/", f)
        assert m and m.group(1) in cells, f"unaffected cell rewritten: {f}"
    _fwd_consistent(spark, idx)


def test_ivf_retrain_resize_crash_is_isolated(spark, sf_dir, tmp_path, monkeypatch):
    """The resize-crash hazard the old intent-marker params guarded
    against, re-pinned under the versioned store where it cannot occur
    by construction: a retrain with explicit n_cells=12 that crashes
    before its commit leaves the 8-cell index EXACTLY as it was (a
    parameterless re-run correctly keeps 8 — there is no half-swapped
    state to converge wrongly from), and a committed resize then
    yields 12 everywhere (centroids, meta, forward map)."""
    import os

    import pytest

    import fink_joiner_spark.operators.similarity as similarity
    from fink_joiner_spark.versioned import VersionedStore

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "retrain_params")
    similarity.build_ivf_index(emb, "vec_id", "embedding", idx, n_cells=8)

    real_commit = VersionedStore.commit

    def crash_commit(self, version, rows):
        raise RuntimeError("boom before any state change")

    monkeypatch.setattr(VersionedStore, "commit", crash_commit)
    with pytest.raises(RuntimeError):
        similarity.retrain_ivf_index(spark, idx, n_cells=12)
    monkeypatch.setattr(VersionedStore, "commit", real_commit)

    # nothing happened: old 8-cell index intact; parameterless re-run
    # keeps 8 — and that is CORRECT (no partial resize exists)
    assert _ivf(spark, idx, "centroids").count() == 8
    similarity.retrain_ivf_index(spark, idx)
    assert _ivf(spark, idx, "centroids").count() == 8
    assert int(_ivf(spark, idx, "meta").first()["n_cells"]) == 8

    # a committed resize applies everywhere atomically
    similarity.retrain_ivf_index(spark, idx, n_cells=12)
    assert _ivf(spark, idx, "centroids").count() == 12
    assert int(_ivf(spark, idx, "meta").first()["n_cells"]) == 12
    _fwd_consistent(spark, idx)


def test_dataset_bytes_handles_uri_encoded_local_paths(spark, tmp_path):
    """inputFiles() returns URI-encoded entries; a local path with a
    space must still be sized (unquote before stat), not raise
    FileNotFoundError."""
    dest = str(tmp_path / "dir with space" / "data")
    spark.range(100).write.mode("overwrite").parquet(dest)
    df = spark.read.parquet(dest)
    assert lake.dataset_bytes(df) > 0


def test_index_builds_write_bucket_shaped_files(spark, sf_dir, tmp_path):
    """Write shaping must hold (r9): a spread input writing through
    partitionBy would otherwise produce O(tasks × dirs) near-empty
    files (measured 424 for a 16-cell build — small-files decay on day
    one). BM25's hash-bucketed writers give exactly ≤ 1 file per
    bucket per dataset; IVF's range-clustered writer is bounded by its
    task count, not tasks × cells."""
    from fink_joiner_spark.operators import scoring, similarity

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "shape_bm25")
    scoring.build_bm25_index(docs, "doc_id", "text", idx, n_buckets=8)
    for ds in ("postings", "terms", "docs"):
        n = len(_bm25(spark, idx, ds).inputFiles())
        assert n <= 8, (ds, n)

    import os

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    vidx = str(tmp_path / "shape_ivf")
    similarity.build_ivf_index(emb, "vec_id", "embedding", vidx, n_cells=16)
    # the range-clustered write is bounded by the spread task count
    # (plus cell-boundary straddles), NOT tasks × cells — the
    # pathological shape this pins against is ≥ tasks × cells / 2
    n_tasks = max(spark.sparkContext.defaultParallelism, 16)
    n_vec = len(_ivf(spark, vidx, "vectors").inputFiles())
    assert n_vec <= 3 * n_tasks, n_vec


def test_ivf_probe_time_travel_pins_pre_fold_state(spark, sf_dir, tmp_path):
    """Probing an OLDER committed version (time travel, r9) returns
    exactly what the index returned when that version was current —
    the fold that followed must be invisible to the pinned probe."""
    import os

    from fink_joiner_spark.operators import similarity
    from fink_joiner_spark.versioned import VersionedStore

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = str(tmp_path / "tt_ivf")
    similarity.build_ivf_index(
        emb.where(F.col("vec_id") % 2 == 0), "vec_id", "embedding", idx, n_cells=8
    )
    q = emb.filter(F.col("vec_id") < 4)
    before = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, q, "vec_id", "embedding", k=5, nprobe=8
        ).collect()
    }
    v1 = VersionedStore(spark, idx).current()
    similarity.update_ivf_index(
        emb.where(F.col("vec_id") % 2 == 1), "vec_id", "embedding", idx
    )
    pinned = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, q, "vec_id", "embedding", k=5, nprobe=8, version=v1
        ).collect()
    }
    current = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, q, "vec_id", "embedding", k=5, nprobe=8
        ).collect()
    }
    assert pinned == before
    assert current != before  # the fold IS visible unpinned


def test_bm25_empty_delta_fold_commits_marker_only(spark, sf_dir, tmp_path):
    """An EMPTY update delta (a replayed-then-filtered micro-batch is
    the real producer) must not crash on the staged read-back — and
    with an applied_marker it must still commit the marker row, or the
    stream would re-fold that batch forever. Probe output is unchanged
    either way."""
    from fink_joiner_spark.operators import scoring
    from fink_joiner_spark.versioned import VersionedStore

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "empty_fold")
    scoring.build_bm25_index(docs, "doc_id", "text", idx, n_buckets=8)
    terms = ["join", "filter", "window"]
    want = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    v0 = VersionedStore(spark, idx).current()

    empty = docs.where(F.lit(False))
    scoring.update_bm25_index(empty, "doc_id", "text", idx)  # pure no-op
    assert VersionedStore(spark, idx).current() == v0  # no new commit

    scoring.update_bm25_index(empty, "doc_id", "text", idx, applied_marker="b7:x")
    store = VersionedStore(spark, idx)
    assert store.current() == v0 + 1  # marker committed as a new version
    assert any(
        ds == "_applied" and p == "b7:x" for ds, p, _ in store.state_rows()
    )
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    assert got == want


def test_hard_crash_debris_detectable_and_swept(spark, sf_dir, tmp_path):
    """A HARD crash (process death mid-staging — no abort() ran) leaves
    an uncommitted staged version dir: *_pending detects it
    (informational — nothing is half-applied), probes ignore it, and
    the next maintenance op's commit GC sweeps it."""
    from fink_joiner_spark.operators import scoring
    from fink_joiner_spark.versioned import VersionedStore

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "hard_crash_idx")
    scoring.build_bm25_index(docs, "doc_id", "text", idx, n_buckets=8)
    terms = ["join", "filter"]
    pre = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}

    store = VersionedStore(spark, idx)
    cur = store.current()
    store.fs.mkdirs(f"{store.vdir(cur + 1)}/postings")  # crashed staging
    assert scoring.bm25_upsert_pending(spark, idx)
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    assert got == pre  # debris invisible to probes

    scoring.compact_bm25_index(spark, idx)  # any next op sweeps it
    assert not scoring.bm25_upsert_pending(spark, idx)
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    assert got == pre
