"""Minimal Avro BINARY codec + the no-jar Kafka-Avro decode path.

The S2/S3 production decode is ``from_avro`` (spark-avro, a Catalyst
expression — ``sources/streaming.py:kafka_avro_project``); that jar is
not deployed in every environment (this container included), so this
module provides the documented FALLBACK: an Arrow-batched
``mapInPandas`` decoder built on a pure-Python implementation of the
Avro 1.x binary encoding (public spec,
https://avro.apache.org/docs/1.11.1/specification/#binary-encoding):

* int/long — zigzag then little-endian base-128 varint;
* string/bytes — long-encoded byte length, then the bytes;
* boolean — one byte 0/1; double/float — IEEE little-endian;
* record — the concatenation of its fields' encodings, in order.

Only flat records of those primitives are supported — exactly the
shape the reference moves (``MyAvroDeserializationSchema.scala:13-45``
decodes schemaless flat records;
``BinaryAvroDeserializationSchema.scala:33-42`` adds the base64
unwrap, re-expressed here with the SAME JVM-side ``unbase64`` column
expression the production path uses).

The encoder exists so tests and registered queries can RECORD
Kafka-shaped fixtures and round-trip them: encode (Python, per spec)
-> wire bytes -> exact S3 unwrap expression -> decode (this module)
-> hash-compare against the source rows.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_SPARK_TYPES = {
    "long": T.LongType(),
    "int": T.IntegerType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "bytes": T.BinaryType(),
}


def parse_schema(avro_schema_json: str) -> list[tuple[str, str]]:
    """Flat-record schema -> ordered [(field, primitive_type)]."""
    sch = json.loads(avro_schema_json)
    if sch.get("type") != "record":
        raise ValueError(f"only flat record schemas supported, got {sch.get('type')}")
    fields = []
    for f in sch["fields"]:
        ftype = f["type"]
        if not isinstance(ftype, str) or ftype not in _SPARK_TYPES:
            raise ValueError(
                f"field {f['name']}: only primitive types "
                f"{sorted(_SPARK_TYPES)} supported, got {ftype!r}"
            )
        fields.append((f["name"], ftype))
    return fields


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(n: int) -> bytes:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7


def encode_record(fields: list[tuple[str, str]], row: dict) -> bytes:
    out = bytearray()
    for name, ftype in fields:
        v = row[name]
        if ftype in ("long", "int"):
            out += _write_long(int(v))
        elif ftype == "string":
            b = str(v).encode("utf-8")
            out += _write_long(len(b)) + b
        elif ftype == "bytes":
            b = bytes(v)
            out += _write_long(len(b)) + b
        elif ftype == "boolean":
            out.append(1 if v else 0)
        elif ftype == "double":
            out += struct.pack("<d", float(v))
        elif ftype == "float":
            out += struct.pack("<f", float(v))
        else:  # pragma: no cover — parse_schema rejects earlier
            raise ValueError(ftype)
    return bytes(out)


def decode_record(fields: list[tuple[str, str]], data: bytes) -> dict:
    row, pos = {}, 0
    for name, ftype in fields:
        if ftype in ("long", "int"):
            v, pos = _read_long(data, pos)
        elif ftype in ("string", "bytes"):
            n, pos = _read_long(data, pos)
            raw = data[pos : pos + n]
            pos += n
            v = raw.decode("utf-8") if ftype == "string" else raw
        elif ftype == "boolean":
            v = data[pos] != 0
            pos += 1
        elif ftype == "double":
            (v,) = struct.unpack_from("<d", data, pos)
            pos += 8
        elif ftype == "float":
            (v,) = struct.unpack_from("<f", data, pos)
            pos += 4
        else:  # pragma: no cover
            raise ValueError(ftype)
        row[name] = v
    if pos != len(data):
        raise ValueError(f"trailing bytes: decoded {pos} of {len(data)}")
    return row


def encode_df(df: DataFrame, avro_schema_json: str, out_col: str = "value") -> DataFrame:
    """Arrow-batched Avro ENCODE of a flat DataFrame — the fixture
    recorder (what a producer would put on the wire). Output: one
    binary ``out_col`` per row; partitioning preserved (no shuffle)."""
    fields = parse_schema(avro_schema_json)
    cols = [n for n, _ in fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    out_col: [
                        encode_record(fields, dict(zip(cols, vals)))
                        for vals in zip(*[pdf[c] for c in cols])
                    ]
                }
            )

    return df.select(*cols).mapInPandas(
        run, T.StructType([T.StructField(out_col, T.BinaryType())])
    )


def kafka_avro_project_py(
    raw: DataFrame, avro_schema_json: str, base64_wrapped: bool = False
) -> DataFrame:
    """S2/S3 decode, no-jar fallback: the SAME base64 unwrap column
    expression as the production path (``unbase64(cast(value as
    string))``, JVM-side), then the record decode in Arrow-batched
    ``mapInPandas`` instead of ``from_avro``. Flattened record columns
    out, same schema the jar path would produce for these primitives.
    """
    fields = parse_schema(avro_schema_json)
    value = (
        F.unbase64(F.col("value").cast("string")) if base64_wrapped else F.col("value")
    )
    payload = raw.select(value.alias("_avro"))
    schema = T.StructType([T.StructField(n, _SPARK_TYPES[t]) for n, t in fields])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_record(fields, bytes(b)) for b in pdf["_avro"]]
            yield pd.DataFrame(rows, columns=[n for n, _ in fields])

    return payload.mapInPandas(run, schema)
