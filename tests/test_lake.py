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
    partition-prune: every input file of the probe plan lies inside a
    probed pb= bucket directory, and the probed bucket count is <= the
    query term count while the index holds many more buckets."""
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

    # pruning audit: the index has many buckets, the probe reads few.
    # inputFiles() lists the WHOLE table (it ignores pruning), so the
    # runtime signal is input_file_name() over the probe's own filter:
    # the files a scan with that filter actually reads.
    all_buckets = {
        m.group(1)
        for f in spark.read.parquet(f"{idx}/postings").inputFiles()
        for m in [re.search(r"pb=(\d+)", f)]
        if m
    }
    assert len(all_buckets) > 10  # vocabulary spreads over many buckets

    n_buckets = 32
    pbs = [
        r.pb
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("pb"))
        .collect()
    ]
    filt = F.col("pb").isin(pbs) & F.col("term").isin(terms)
    read_files = {
        r.f
        for r in spark.read.parquet(f"{idx}/postings")
        .where(filt)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    probed = {re.search(r"pb=(\d+)", f).group(1) for f in read_files}
    assert probed and len(probed) <= len(terms), (probed, terms)
    # and the probe's static plan carries the partition filter
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "pb" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0]


def test_ivf_index_probe_prunes_and_matches_unindexed(spark, sf_dir, tmp_path):
    """The persisted IVF probe must return exactly what topk_ivf
    returns for the same codebook, and must READ only the probed cell
    partitions (runtime input_file_name audit), not the whole index."""
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

    # runtime pruning audit: ≤ |queries|·nprobe = 4 of the 16 cell
    # partitions are actually read by the probe's filtered scan
    all_cells = {
        m.group(1)
        for f in spark.read.parquet(f"{idx}/vectors").inputFiles()
        for m in [re.search(r"cell=(\d+)", f)]
        if m
    }
    assert len(all_cells) >= 8  # seeds spread vectors over many cells
    seeds = spark.read.parquet(f"{idx}/centroids")
    cells_arr = similarity._cells_arr(seeds)
    probes = (
        queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .crossJoin(F.broadcast(cells_arr))
        .select(F.explode(similarity._nearest_cells(F.col("qvec"), 2)).alias("cell"))
    )
    cell_ids = [r.cell for r in probes.distinct().collect()]
    read_cells = {
        re.search(r"cell=(\d+)", r.f).group(1)
        for r in spark.read.parquet(f"{idx}/vectors")
        .where(F.col("cell").isin(cell_ids))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert read_cells and len(read_cells) <= 4, (read_cells, all_cells)


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
    before = set(spark.read.parquet(f"{inc}/postings").inputFiles())
    scoring.update_bm25_index(new, "doc_id", "text", inc)
    after = set(spark.read.parquet(f"{inc}/postings").inputFiles())
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
    m_inc = spark.read.parquet(os.path.join(inc, "meta")).first()
    m_full = spark.read.parquet(os.path.join(full, "meta")).first()
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
    meta1 = spark.read.parquet(f"{idx}/meta").first()

    # (1) full redelivery: fresh checkpoint, same staged files → no-op
    shutil.rmtree(str(tmp_path / "ckpt1"))
    run(stage1, str(tmp_path / "ckpt2"))
    meta2 = spark.read.parquet(f"{idx}/meta").first()
    assert (meta1["n_docs"], meta1["sum_dl"]) == (meta2["n_docs"], meta2["sum_dl"])

    # (2) new stream, new docs, fresh checkpoint (batch ids restart at
    # 0) → MUST be folded in, not skipped
    stage2 = str(tmp_path / "stage2")
    file_drip_feed(spark, delta2, stage2, "doc_id", n_files=2)
    run(stage2, str(tmp_path / "ckpt3"))
    meta3 = spark.read.parquet(f"{idx}/meta").first()
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
    n_files_before = len(spark.read.parquet(f"{idx}/postings").inputFiles())

    scoring.compact_bm25_index(spark, idx)

    files_after = spark.read.parquet(f"{idx}/postings").inputFiles()
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
    before = set(spark.read.parquet(f"{idx}/vectors").inputFiles())
    similarity.update_ivf_index(
        emb.where(F.col("vec_id") % 2 == 1), "vec_id", "embedding", idx
    )
    after = set(spark.read.parquet(f"{idx}/vectors").inputFiles())
    assert before <= after and len(after) > len(before)

    queries = emb.filter(F.col("vec_id") < 4)
    got = {
        tuple(r)
        for r in similarity.topk_ivf_indexed(
            spark, idx, queries, "vec_id", "embedding", k=5, nprobe=3
        ).collect()
    }
    seeds = spark.read.parquet(f"{idx}/centroids")
    want = {
        tuple(r)
        for r in similarity.topk_ivf(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=5, nprobe=3, centroids=seeds,
        ).collect()
    }
    assert got == want and got


def test_bm25_compaction_recovers_from_crash_states(spark, sf_dir, tmp_path):
    """A compaction that crashed mid-swap (postings renamed away, new
    data not yet in place) or post-swap (retired debris left behind)
    must be repaired automatically by the next run, with probe results
    intact."""
    import os
    import shutil

    from fink_joiner_spark.operators import scoring

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "crash_idx")
    scoring.build_bm25_index(docs, "doc_id", "text", idx, n_buckets=8)
    terms = ["join", "filter", "window"]
    want = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}

    # crash between the two renames: postings gone, retired holds data
    os.rename(f"{idx}/postings", f"{idx}/postings_retired")
    os.makedirs(f"{idx}/postings_compacting")  # plus a stale staged dir
    scoring.compact_bm25_index(spark, idx)
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    assert got == want
    assert not os.path.exists(f"{idx}/postings_retired")
    assert not os.path.exists(f"{idx}/postings_compacting")

    # crash after the swap: retired debris beside live postings
    shutil.copytree(f"{idx}/postings", f"{idx}/postings_retired")
    scoring.compact_bm25_index(spark, idx)
    got = {tuple(r) for r in scoring.bm25_indexed_scores(spark, idx, terms).collect()}
    assert got == want
    assert not os.path.exists(f"{idx}/postings_retired")
