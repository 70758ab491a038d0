"""UDF/UDTF surface tests (SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fink_joiner_spark.catalog import table
from fink_joiner_spark.functions import register_all
from fink_joiner_spark.operators.similarity import cosine


def test_udtf_lateral_shingles(spark):
    register_all(spark)
    spark.createDataFrame(
        [(1, "a b c d"), (2, "x y")], "doc_id long, text string"
    ).createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        "SELECT d.doc_id, s.shingle, s.pos FROM docs_udtf d, "
        "LATERAL shingles(d.text) s"
    ).collect()
    got = {(r.doc_id, r.shingle) for r in rows}
    assert got == {(1, "a b c"), (1, "b c d")}  # doc 2 too short → no rows


def test_pandas_cosine_udf_matches_sql_cosine(spark, sf_dir):
    register_all(spark)
    emb = table(spark, sf_dir, "embeddings").limit(50)
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(b, F.expr("a.vec_id + 1 = b.vec_id")).select(
        F.col("a.embedding").alias("va"), F.col("b.embedding").alias("vb")
    )
    both = pairs.select(
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sql_cos"),
        F.round(F.expr("cosine_sim(va, vb)"), 6).alias("udf_cos"),
    )
    for r in both.collect():
        assert abs(r.sql_cos - r.udf_cos) < 1e-5
