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


def test_weighted_mean_grouped_agg_udf(spark):
    from pyspark.sql import functions as F

    from fink_joiner_spark.functions import weighted_mean_agg_udf

    df = spark.createDataFrame(
        [(1, 10.0, 1.0), (1, 20.0, 3.0), (2, 5.0, 2.0), (3, 7.0, 0.0)],
        "k long, v double, w double",
    )
    out = {
        r["k"]: r["wm"]
        for r in df.groupBy("k").agg(weighted_mean_agg_udf()("v", "w").alias("wm")).collect()
    }
    assert abs(out[1] - 17.5) < 1e-9 and abs(out[2] - 5.0) < 1e-9
    # zero total weight -> NaN from the UDF, surfaced as SQL NULL by
    # the Arrow boundary — not an error
    assert out[3] is None


def test_json_corrupt_records_are_captured_not_fatal(spark, tmp_path):
    """PERMISSIVE-mode json source: malformed lines land in the corrupt-
    record column instead of failing the 100 TB job; good rows parse."""
    p = tmp_path / "in.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{BROKEN\n{"a": 2, "b": "y"}\n')
    from fink_joiner_spark.sources.batch import read_files

    df = read_files(
        spark,
        str(p),
        format="json",
        schema="a long, b string, _corrupt_record string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).cache()  # cache: corrupt-record column requires a materialized scan
    try:
        good = df.where(F.col("_corrupt_record").isNull())
        bad = df.where(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2 and bad.count() == 1
        assert bad.first()["_corrupt_record"].startswith("{BROKEN")
    finally:
        df.unpersist()
