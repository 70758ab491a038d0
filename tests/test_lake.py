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
