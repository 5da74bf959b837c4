"""typedbytes codec + Spark reader — byte-compat migration path.

dumbo's native serialization is Hadoop typedbytes (HADOOP-1722, driven
by the dumbo author; reference ``dumbo/backends/streaming.py:~120``
pipes it through Hadoop Streaming, ``cmd.py:~140`` cat-decodes it). A
migrating user's existing sequence-of-typedbytes-pairs files become
readable here without a Hadoop round trip.

Wire format (public spec, HADOOP-1722): each value is a 1-byte type
code then a big-endian payload:

    0 bytes(len:i32)   1 byte   2 bool   3 int32   4 int64
    5 float32          6 float64        7 utf8-string(len:i32)
    8 vector(count:i32, elems)  9 list(elems..., 0xFF terminator)
    10 map(count:i32, k/v pairs)

Codes 50–200 are application-defined; dumbo's Python typedbytes lib
writes pickled objects at 144 — DELIBERATELY not decoded here
(unpickling foreign bytes is an arbitrary-code-execution hazard);
those records surface as an error naming the offending code.

Scale notes: a .tb file is a concatenated stream with no sync markers,
so it is NOT splittable — parallelism is per-file (Spark's binaryFile
source gives one task per file, which is how these files were produced
anyway: one per reducer). The supported pattern is one-shot ingest →
parquet (``python -m dumbo_spark.cli convert --to parquet``), after
which everything is columnar, splittable, and predicate-pushable; .tb
is a migration format, not an operating format.
"""

from __future__ import annotations

import io
import struct
from collections.abc import Iterator
from typing import Any, BinaryIO

# type codes (HADOOP-1722)
BYTES, BYTE, BOOL, INT, LONG, FLOAT, DOUBLE, STRING, VECTOR, LIST, MAP = range(11)
LIST_END = 0xFF


# ── encoder ─────────────────────────────────────────────────────────────


def write_value(out: BinaryIO, obj: Any) -> None:
    if isinstance(obj, bool):  # before int: bool is an int subclass
        out.write(struct.pack(">BB", BOOL, 1 if obj else 0))
    elif isinstance(obj, int):
        if -(2**31) <= obj < 2**31:
            out.write(struct.pack(">Bi", INT, obj))
        else:
            out.write(struct.pack(">Bq", LONG, obj))
    elif isinstance(obj, float):
        out.write(struct.pack(">Bd", DOUBLE, obj))
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        out.write(struct.pack(">Bi", STRING, len(b)))
        out.write(b)
    elif isinstance(obj, (bytes, bytearray)):
        out.write(struct.pack(">Bi", BYTES, len(obj)))
        out.write(obj)
    elif isinstance(obj, tuple):
        out.write(struct.pack(">Bi", VECTOR, len(obj)))
        for item in obj:
            write_value(out, item)
    elif isinstance(obj, list):
        out.write(struct.pack(">B", LIST))
        for item in obj:
            write_value(out, item)
        out.write(struct.pack(">B", LIST_END))
    elif isinstance(obj, dict):
        out.write(struct.pack(">Bi", MAP, len(obj)))
        for k, v in obj.items():
            write_value(out, k)
            write_value(out, v)
    else:
        raise TypeError(f"typedbytes cannot encode {type(obj).__name__}")


def dumps(obj: Any) -> bytes:
    buf = io.BytesIO()
    write_value(buf, obj)
    return buf.getvalue()


# ── decoder ─────────────────────────────────────────────────────────────


def _read_exact(inp: BinaryIO, n: int) -> bytes:
    b = inp.read(n)
    if len(b) != n:
        raise EOFError("truncated typedbytes stream")
    return b


#: Sanity cap on length/count prefixes. The format's i32 prefixes are
#: attacker-controlled in foreign files; a negative length would make
#: ``read(n)`` a no-op (confusing EOFError downstream) and a huge
#: VECTOR/MAP count would attempt an enormous allocation before any
#: data is read. 1 GiB per value / 256M elements is far beyond any
#: legitimate dumbo record.
MAX_LEN = 1 << 30
MAX_COUNT = 1 << 28


def _checked_len(n: int, cap: int = MAX_LEN) -> int:
    if n < 0 or n > cap:
        raise ValueError(f"corrupt typedbytes length {n}")
    return n


def read_value(inp: BinaryIO) -> Any:
    code = _read_exact(inp, 1)[0]
    if code == BYTES:
        (n,) = struct.unpack(">i", _read_exact(inp, 4))
        return _read_exact(inp, _checked_len(n))
    if code == BYTE:
        return struct.unpack(">b", _read_exact(inp, 1))[0]
    if code == BOOL:
        return _read_exact(inp, 1)[0] != 0
    if code == INT:
        return struct.unpack(">i", _read_exact(inp, 4))[0]
    if code == LONG:
        return struct.unpack(">q", _read_exact(inp, 8))[0]
    if code == FLOAT:
        return struct.unpack(">f", _read_exact(inp, 4))[0]
    if code == DOUBLE:
        return struct.unpack(">d", _read_exact(inp, 8))[0]
    if code == STRING:
        (n,) = struct.unpack(">i", _read_exact(inp, 4))
        return _read_exact(inp, _checked_len(n)).decode("utf-8")
    if code == VECTOR:
        (n,) = struct.unpack(">i", _read_exact(inp, 4))
        n = _checked_len(n, MAX_COUNT)
        return tuple(read_value(inp) for _ in range(n))
    if code == LIST:
        items = []
        while True:
            nxt = _read_exact(inp, 1)[0]
            if nxt == LIST_END:
                return items
            inp.seek(-1, io.SEEK_CUR)
            items.append(read_value(inp))
    if code == MAP:
        (n,) = struct.unpack(">i", _read_exact(inp, 4))
        n = _checked_len(n, MAX_COUNT)
        return {read_value(inp): read_value(inp) for _ in range(n)}
    raise ValueError(
        f"unsupported typedbytes code {code} "
        "(application-defined codes, incl. dumbo's 144=pickle, are not decoded)"
    )


def loads(b: bytes) -> Any:
    return read_value(io.BytesIO(b))


def read_pairs(inp: BinaryIO) -> Iterator[tuple[Any, Any]]:
    """Iterate (key, value) records until EOF — dumbo's file layout."""
    while True:
        head = inp.read(1)
        if not head:
            return
        inp.seek(-1, io.SEEK_CUR)
        key = read_value(inp)
        yield key, read_value(inp)


def write_pairs(out: BinaryIO, pairs) -> int:
    n = 0
    for k, v in pairs:
        write_value(out, k)
        write_value(out, v)
        n += 1
    return n


# ── Spark integration ───────────────────────────────────────────────────


def read_typedbytes(spark, path: str, schema: str = "key string, value string"):
    """Distributed .tb ingest: one decode task per file (binaryFile
    source), mapInPandas does the byte decode, output cast to
    ``schema`` (two fields: key, value). Non-scalar keys/values are
    JSON-encoded when the target field is a string.

    The files-parallel plan mirrors how the files were written (one per
    reducer); convert to parquet immediately for anything beyond
    ingest.
    """
    import json as _json

    import pandas as pd

    from pyspark.sql import functions as F

    def decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                ks, vs = [], []
                for k, v in read_pairs(io.BytesIO(bytes(content))):
                    ks.append(_coerce(k, _json))
                    vs.append(_coerce(v, _json))
                yield pd.DataFrame({"key": ks, "value": vs})

    from pyspark.sql import types as T

    raw = spark.read.format("binaryFile").load(path).select("content")
    decoded = raw.mapInPandas(decode, schema="key string, value string")
    # Real DDL parse, not split(","): comma-bearing types like
    # "value decimal(18,2)" or "value array<int>" are valid two-field
    # schemas and must not be rejected.
    parsed = T.StructType.fromDDL(schema)
    if len(parsed.fields) != 2:
        raise ValueError("schema must declare exactly two fields: key, value")
    casts = [
        F.col(colname).cast(field.dataType).alias(field.name)
        for colname, field in zip(("key", "value"), parsed.fields)
    ]
    return decoded.select(*casts)


def _coerce(obj: Any, _json) -> str | None:
    if obj is None:
        return None
    if isinstance(obj, bytes):
        return obj.decode("utf-8", "replace")
    if isinstance(obj, (str, int, float, bool)):
        return str(obj)
    if isinstance(obj, tuple):
        obj = list(obj)
    return _json.dumps(obj, sort_keys=True)
