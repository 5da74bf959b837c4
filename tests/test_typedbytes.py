"""typedbytes codec (HADOOP-1722 wire format) + Spark ingest path."""

from __future__ import annotations

import io
import struct

import pytest

from dumbo_spark.sources import typedbytes as tb


def test_scalar_roundtrip():
    for obj in [b"raw", True, False, 7, -(2**40), 3.25, "héllo", ""]:
        assert tb.loads(tb.dumps(obj)) == obj


def test_container_roundtrip():
    obj = {"k": [1, 2.5, "x"], "pair": (1, "a"), "deep": {"m": [True, b"z"]}}
    got = tb.loads(tb.dumps(obj))
    assert got["k"] == [1, 2.5, "x"]
    assert got["pair"] == (1, "a")  # vectors stay tuples
    assert got["deep"] == {"m": [True, b"z"]}


def test_wire_format_is_hadoop_spec():
    # int 5 → code 3, big-endian i32; string → code 7 + len
    assert tb.dumps(5) == struct.pack(">Bi", 3, 5)
    assert tb.dumps("ab") == struct.pack(">Bi", 7, 2) + b"ab"
    assert tb.dumps(2**40) == struct.pack(">Bq", 4, 2**40)
    assert tb.dumps(True) == bytes([2, 1])


def test_pair_file_roundtrip(tmp_path):
    pairs = [("w1", 3), ("w2", 1.5), ((1, 2), ["a", "b"])]
    p = tmp_path / "out.tb"
    with open(p, "wb") as f:
        assert tb.write_pairs(f, pairs) == 3
    with open(p, "rb") as f:
        got = list(tb.read_pairs(f))
    assert got == pairs


def test_unknown_code_rejected():
    with pytest.raises(ValueError, match="144"):
        tb.loads(bytes([144, 0, 0, 0, 0]))


def test_truncated_stream_raises():
    with pytest.raises(EOFError):
        tb.loads(struct.pack(">Bi", 7, 10) + b"ab")


def test_spark_read_typedbytes(spark, tmp_path):
    with open(tmp_path / "part-00000.tb", "wb") as f:
        tb.write_pairs(f, [("alpha", 1), ("beta", 2)])
    with open(tmp_path / "part-00001.tb", "wb") as f:
        tb.write_pairs(f, [("gamma", 3), ("nested", {"a": 1})])
    df = tb.read_typedbytes(spark, str(tmp_path / "*.tb"), schema="word string, n string")
    got = {r.word: r.n for r in df.collect()}
    assert got == {"alpha": "1", "beta": "2", "gamma": "3", "nested": '{"a": 1}'}
    assert df.columns == ["word", "n"]


def test_spark_read_typedbytes_typed_value(spark, tmp_path):
    with open(tmp_path / "data.tb", "wb") as f:
        tb.write_pairs(f, [("a", 10), ("b", 20)])
    df = tb.read_typedbytes(spark, str(tmp_path / "data.tb"), schema="k string, v long")
    assert {(r.k, r.v) for r in df.collect()} == {("a", 10), ("b", 20)}
    assert dict(df.dtypes)["v"] == "bigint"


def test_corrupt_length_prefix_rejected():
    """Attacker-controlled i32 prefixes must fail loudly, not as a
    confusing EOFError (negative) or a giant allocation (huge count)."""
    # BYTES with negative length
    with pytest.raises(ValueError, match="corrupt typedbytes length"):
        tb.loads(struct.pack(">Bi", 0, -5))
    # STRING with absurd length (1 GiB cap)
    with pytest.raises(ValueError, match="corrupt typedbytes length"):
        tb.loads(struct.pack(">Bi", 7, (1 << 30) + 1))
    # VECTOR with absurd element count
    with pytest.raises(ValueError, match="corrupt typedbytes length"):
        tb.loads(struct.pack(">Bi", 8, (1 << 28) + 1))


def test_schema_with_comma_bearing_type(spark, tmp_path):
    """decimal(18,2) / array<...> types contain commas — the schema
    parse must be a real DDL parse, not split(',') (ADVICE r2)."""
    with open(tmp_path / "data.tb", "wb") as f:
        tb.write_pairs(f, [("a", "10.50"), ("b", "20.25")])
    df = tb.read_typedbytes(
        spark, str(tmp_path / "data.tb"), schema="k string, v decimal(18,2)"
    )
    assert dict(df.dtypes)["v"] == "decimal(18,2)"
    got = {(r.k, str(r.v)) for r in df.collect()}
    assert got == {("a", "10.50"), ("b", "20.25")}
    with pytest.raises(ValueError, match="exactly two fields"):
        tb.read_typedbytes(spark, str(tmp_path / "data.tb"),
                           schema="a string, b string, c string")
