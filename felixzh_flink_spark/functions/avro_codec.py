"""Pure-Python Avro binary codec (F7) — self-contained fallback.

Reference parity: format/src/main/java/com/felixzh/flink/format/avro/
Avro2Avro.java:25-45 encodes/decodes Kafka record values as raw Avro binary
datums against a DDL-derived writer schema (Constant.java:10-17). Spark's
native path is `from_avro`/`to_avro` from the spark-avro artifact; that jar
is not on this container's classpath (functions.formats gates on HAS_AVRO),
so this module implements the Avro 1.x binary encoding for flat records in
pure Python, exposed as Arrow-batched pandas UDFs.

SLOW PATH, by design: a pandas UDF moves each batch Python-side — roughly
10× the cost of the JVM expression `to_avro` would be. In deployment, add
org.apache.spark:spark-avro to spark.jars.packages and `functions.formats`
picks the JVM implementation automatically; this codec is the
correctness-complete fallback, not the scale path.

Wire format implemented (Avro spec "Binary encoding"):
- int/long: zigzag + base-128 varint          - double/float: IEEE little-endian
- boolean: single byte                        - string/bytes: varint length + payload
- union ["null", T]: varint branch index      - record: fields in declaration order
- logical timestamp-micros: long

Supported Spark types: long, int, double, float, string, boolean, binary,
timestamp/timestamp_ntz (as timestamp-micros). Every field is encoded as the
nullable union ["null", T] — matching Flink's avro converters for nullable
DDL columns.
"""

from __future__ import annotations

import struct as _struct

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F, types as T
from pyspark.sql.functions import pandas_udf

# ------------------------------------------------------------- schema mapping

_SPARK_TO_AVRO = {
    T.LongType(): "long",
    T.IntegerType(): "int",
    T.DoubleType(): "double",
    T.FloatType(): "float",
    T.StringType(): "string",
    T.BooleanType(): "boolean",
    T.BinaryType(): "bytes",
}

_TS_AVRO = {"type": "long", "logicalType": "timestamp-micros"}


def avro_schema_of(schema: T.StructType, name: str = "row") -> dict:
    """Spark struct → Avro record schema (every field a nullable union),
    the shape Flink derives from a DDL (Constant.java:10-17)."""
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            avro_t: object = _TS_AVRO
        else:
            try:
                avro_t = _SPARK_TO_AVRO[f.dataType]
            except KeyError:
                raise TypeError(f"avro codec: unsupported type {f.dataType} "
                                f"for field {f.name}")
        fields.append({"name": f.name, "type": ["null", avro_t], "default": None})
    return {"type": "record", "name": name, "fields": fields}


# ------------------------------------------------------------- binary codec

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: bytearray, n: int) -> None:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7


def _encode_value(out: bytearray, v, kind: str) -> None:
    if kind in ("long", "int"):
        _write_varint(out, int(v))
    elif kind == "double":
        out += _struct.pack("<d", float(v))
    elif kind == "float":
        out += _struct.pack("<f", float(v))
    elif kind == "boolean":
        out.append(1 if v else 0)
    elif kind == "string":
        raw = str(v).encode("utf-8")
        _write_varint(out, len(raw))
        out += raw
    elif kind == "bytes":
        raw = bytes(v)
        _write_varint(out, len(raw))
        out += raw
    else:  # pragma: no cover
        raise TypeError(f"avro codec: unsupported kind {kind}")


def _decode_value(buf: bytes, pos: int, kind: str):
    if kind in ("long", "int"):
        return _read_varint(buf, pos)
    if kind == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if kind == "boolean":
        return buf[pos] == 1, pos + 1
    if kind == "string":
        n, pos = _read_varint(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if kind == "bytes":
        n, pos = _read_varint(buf, pos)
        return bytes(buf[pos:pos + n]), pos + n
    raise TypeError(f"avro codec: unsupported kind {kind}")  # pragma: no cover


def _kind(avro_type: object) -> str:
    """Field kind from a (possibly union / logical) avro type entry."""
    if isinstance(avro_type, list):  # ["null", T]
        avro_type = next(t for t in avro_type if t != "null")
    if isinstance(avro_type, dict):
        return avro_type["type"]  # logical types ride their base type
    return str(avro_type)


def encode_record(values: list, kinds: list[str]) -> bytes:
    """One row (field values in schema order) → avro binary datum."""
    out = bytearray()
    for v, kind in zip(values, kinds):
        if v is None:
            _write_varint(out, 0)  # union branch: null
        else:
            _write_varint(out, 1)  # union branch: value
            _encode_value(out, v, kind)
    return bytes(out)


def decode_record(buf: bytes, kinds: list[str]) -> list:
    """Avro binary datum → field values in schema order."""
    pos, vals = 0, []
    for kind in kinds:
        branch, pos = _read_varint(buf, pos)
        if branch == 0:
            vals.append(None)
        else:
            v, pos = _decode_value(buf, pos, kind)
            vals.append(v)
    return vals


# ------------------------------------------------------------- Spark surface

def _ts_cols(schema: T.StructType) -> list[str]:
    return [f.name for f in schema.fields
            if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))]


def _wire_schema(schema: T.StructType) -> T.StructType:
    """Schema as seen by the Python codec: timestamps carried as long micros
    (converted JVM-side — keeps the Python layer free of tz/unit pitfalls)."""
    return T.StructType([
        T.StructField(f.name, T.LongType() if isinstance(
            f.dataType, (T.TimestampType, T.TimestampNTZType)) else f.dataType)
        for f in schema.fields
    ])


def encode_avro_python(df: DataFrame, cols: list[str],
                       schema: T.StructType) -> DataFrame:
    """Rows → single `value` binary column of avro datums (Arrow-batched).
    `schema` may be the full table schema; only `cols` are encoded."""
    schema = T.StructType([schema[c] for c in cols])
    avro = avro_schema_of(schema)
    kinds = [_kind(f["type"]) for f in avro["fields"]]
    names = [f["name"] for f in avro["fields"]]

    # Integral columns cross the Arrow boundary as STRINGS: an int/long
    # column containing ANY null otherwise lands in pandas as float64
    # (NaN-for-null), silently rounding values above 2^53 before encoding —
    # a lossy roundtrip for large ids/timestamp-micros. Decimal strings
    # parse back to exact Python ints at negligible cost for a Python codec.
    wire_int = {n for n, k in zip(names, kinds) if k in ("int", "long")}
    # float/double ALSO cross as strings: pandas represents null as NaN in
    # a float64 column, so `pd.isna` cannot tell a genuine NaN measurement
    # from a missing value — the codec would rewrite NaN to the null
    # branch. Spark's double→string gives a uniquely-round-tripping repr
    # ("NaN"/"Infinity" included) and Python float() recovers identical
    # bits; nulls stay None in a string column.
    wire_float = {n for n, k in zip(names, kinds) if k in ("float", "double")}

    @pandas_udf(T.BinaryType())
    def enc(rows: pd.DataFrame) -> pd.Series:
        data = rows[names]

        def conv(name: str, v):
            if v is None or pd.isna(v):
                return None
            if name in wire_int:
                return int(v)
            if name in wire_float:
                return float(v)
            return v

        out = [encode_record([conv(n, v) for n, v in zip(names, tup)], kinds)
               for tup in data.itertuples(index=False, name=None)]
        return pd.Series(out, dtype=object)

    proj = df.select(*[
        F.unix_micros(F.col(c).cast("timestamp")).alias(c)
        if c in _ts_cols(schema) else F.col(c)
        for c in cols
    ])
    proj = proj.select(*[
        F.col(c).cast("string").alias(c) if c in wire_int | wire_float
        else F.col(c)
        for c in cols
    ])
    return proj.select(enc(F.struct(*cols)).alias("value"))


def decode_avro_python(df: DataFrame, value_col: str,
                       schema: T.StructType) -> DataFrame:
    """`value` binary avro datums → typed columns (timestamps restored
    JVM-side from micros)."""
    avro = avro_schema_of(schema)
    kinds = [_kind(f["type"]) for f in avro["fields"]]
    wire = _wire_schema(schema)

    names = [f.name for f in wire.fields]

    # float/double leave the UDF as repr STRINGS cast back JVM-side:
    # pandas→Arrow treats a float NaN as null (nan_as_null), so a decoded
    # NaN datum would be silently rewritten to NULL at the Arrow boundary
    # — the mirror of the encode-side transport.
    float_cols = {n for n, k in zip(names, kinds) if k in ("float", "double")}
    udf_schema = T.StructType([
        T.StructField(f.name, T.StringType(), True)
        if f.name in float_cols else f
        for f in wire.fields
    ])

    def _fmt_float(v):
        if v is None:
            return None
        if v != v:                    # NaN
            return "NaN"
        if v == float("inf"):
            return "Infinity"
        if v == float("-inf"):
            return "-Infinity"
        return repr(v)                # shortest round-trip decimal

    @pandas_udf(udf_schema)
    def dec(vals: pd.Series) -> pd.DataFrame:
        rows = [decode_record(b, kinds) for b in vals]
        # Build integral columns as nullable Int64 extension arrays:
        # pd.DataFrame(rows) would infer float64 for an int column with
        # any None, rounding values above 2^53 before Arrow re-converts
        # to long — the mirror of the encode-side hazard.
        by_col = list(zip(*rows)) if rows else [[] for _ in names]
        out_cols = {}
        for name, kind, vals_c in zip(names, kinds, by_col):
            if kind in ("int", "long"):
                out_cols[name] = pd.array(vals_c, dtype="Int64")
            elif name in float_cols:
                out_cols[name] = pd.Series(
                    [_fmt_float(v) for v in vals_c], dtype=object)
            else:
                out_cols[name] = pd.Series(list(vals_c), dtype=object)
        return pd.DataFrame(out_cols)

    out = df.select(dec(F.col(value_col)).alias("r")).select("r.*")
    ts = set(_ts_cols(schema))
    return out.select(*[
        F.timestamp_micros(F.col(f.name)).cast(schema[f.name].dataType).alias(f.name)
        if f.name in ts else
        (F.col(f.name).cast(schema[f.name].dataType).alias(f.name)
         if f.name in float_cols else F.col(f.name))
        for f in schema.fields if f.name in out.columns
    ])


def avro_roundtrip(df: DataFrame, cols: list[str],
                   schema: T.StructType) -> DataFrame:
    """Encode rows to avro binary datums and decode back — the Avro2Avro
    pipeline shape (kafka-avro source → SELECT → kafka-avro sink,
    Avro2Avro.java:25-45). Identity on the projected columns."""
    encoded = encode_avro_python(df, cols, schema)
    sub = T.StructType([schema[c] for c in cols])
    return decode_avro_python(encoded, "value", sub)
