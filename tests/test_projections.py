"""P1 envelope-projection edge cases: the reference's mappers null-guard
every field (missing envelope strings → "", missing longs → 0, missing
payload keys → NULL; CRMLSJoiner.scala:122-139). Pin that exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from fink_joiner_spark.operators import projections


def test_missing_envelope_fields_default(spark):
    raw = spark.createDataFrame(
        [
            ('{"uc_pk": "k1", "uc_created_ts": 7}',),   # partial envelope
            ('{"data": "{\\"x\\": 1}"}',),              # only payload
            ("not json at all",),                        # garbage
            (None,),                                     # null record
        ],
        "value string",
    )
    out = projections.parse_envelope(raw, "value").collect()
    by_pk = {r.uc_pk: r for r in out}
    assert by_pk["k1"].uc_created_ts == 7
    assert by_pk["k1"].data == ""            # missing string → ""
    assert by_pk["k1"].uc_valid_day == 0     # missing long → 0
    # garbage/null rows survive with full defaults (never dropped)
    assert len(out) == 4
    defaults = [r for r in out if r.uc_pk == ""]
    assert len(defaults) == 3 or len(defaults) == 2  # payload-only row also has "" pk
    for r in out:
        assert r.data is not None and r.uc_created_ts is not None


def test_missing_payload_key_is_null(spark):
    raw = spark.createDataFrame(
        [
            ('{"uc_pk": "a", "data": "{\\"ListingKeyNumeric\\": \\"99\\"}"}',),
            ('{"uc_pk": "b", "data": "{\\"other\\": 1}"}',),
            ('{"uc_pk": "c"}',),
        ],
        "value string",
    )
    out = projections.parse_envelope(
        raw, "value", payload_keys={"listing_key": "$.ListingKeyNumeric"}
    )
    got = {r.uc_pk: r.listing_key for r in out.collect()}
    assert got == {"a": "99", "b": None, "c": None}


def test_nested_array_extraction_matches_reference_shape(spark):
    """FlinkJoiner.scala:186-190: payload['ActiveAgent:Agent'][0]['Agent ID']."""
    raw = spark.createDataFrame(
        [
            (1, '{"ActiveAgent:Agent": [{"Agent ID": "A7"}, {"Agent ID": "A8"}]}'),
            (2, '{"ActiveAgent:Agent": []}'),
            (3, "{}"),
        ],
        "id long, payload string",
    )
    out = projections.extract_nested_array(
        raw, "payload", "$['ActiveAgent:Agent'][0]['Agent ID']", "agent_id"
    )
    got = {r.id: r.agent_id for r in out.collect()}
    assert got == {1: "A7", 2: None, 3: None}
