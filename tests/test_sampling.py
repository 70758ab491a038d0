"""Deterministic sampling/split/chunk operators: stability under
repartitioning (the property seeded sampling lacks) and exact chunk
coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from fink_joiner_spark.catalog import table
from fink_joiner_spark.operators import sampling
from fink_joiner_spark.operators.text import chunk_text


def test_split_stable_under_repartition(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    a = {(r.doc_id, r.split) for r in sampling.with_split(docs, "doc_id").select("doc_id", "split").collect()}
    b = {
        (r.doc_id, r.split)
        for r in sampling.with_split(docs.repartition(13), "doc_id")
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    splits = {s for _, s in a}
    assert splits == {"train", "val", "test"}
    n = len(a)
    n_train = sum(1 for _, s in a if s == "train")
    assert 0.6 * n < n_train < 0.95 * n  # ~80% on 500 docs


def test_split_weights_must_sum_to_100(spark, sf_dir):
    import pytest

    docs = table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        sampling.with_split(docs, "doc_id", {"train": 50, "val": 10})


def test_stratified_sample_subset_and_stable(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    samp = sampling.stratified_sample(
        ev, "event_id", "event_type", {"click": 0.05}, default_fraction=0.2
    )
    ids = {r.event_id for r in samp.select("event_id").collect()}
    ids2 = {
        r.event_id
        for r in sampling.stratified_sample(
            ev.repartition(7), "event_id", "event_type", {"click": 0.05}, default_fraction=0.2
        ).select("event_id").collect()
    }
    assert ids == ids2 and 0 < len(ids) < ev.count()


def test_chunks_reconstruct_documents(spark, sf_dir):
    """Non-overlap prefix (stride chars) of each chunk, concatenated in
    order, rebuilds the document exactly; every chunk <= size chars."""
    docs = table(spark, sf_dir, "documents").limit(50)
    chunks = chunk_text(docs, "doc_id", "text", size=200, stride=150)
    assert chunks.filter(F.length("chunk") > 200).count() == 0
    rebuilt = (
        chunks.withColumn("piece", F.expr("substring(chunk, 1, 150)"))
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.array_sort(F.collect_list(F.struct("chunk_idx", "piece"))).piece).alias("rebuilt"))
    )
    joined = rebuilt.join(docs, "doc_id").filter(F.col("rebuilt") != F.col("text"))
    assert joined.count() == 0
