"""Avro container codec: pure-Python roundtrip, Spark write/read
roundtrip, and cross-implementation parity against the JVM Avro
reference reader that ships on Spark's classpath."""

from __future__ import annotations

import datetime
import glob
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mhm_data_pipelines_spark.sources.avro_io import (
    avro_to_spark_schema,
    decode_container,
    encode_container,
    read_avro,
    spark_to_avro_schema,
    write_avro,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("raw", T.BinaryType(), True),
        T.StructField("vec", T.ArrayType(T.DoubleType(), False), True),
        T.StructField("nn", T.IntegerType(), False),
    ]
)
ROWS = [
    {
        "id": 1,
        "name": "a",
        "score": 1.5,
        "flag": True,
        "d": datetime.date(2024, 2, 29),
        "ts": datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
        "raw": b"\x00\xff",
        "vec": [1.0, -2.5],
        "nn": 7,
    },
    {
        "id": -12345678901234,
        "name": None,
        "score": None,
        "flag": False,
        "d": None,
        "ts": None,
        "raw": None,
        "vec": [],
        "nn": -1,
    },
    {
        "id": 0,
        "name": "üñïçødé",
        "score": -0.25,
        "flag": None,
        "d": datetime.date(1969, 12, 31),
        "ts": datetime.datetime(1955, 5, 5),
        "raw": b"",
        "vec": [3.5],
        "nn": 2**31 - 1,
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_codec_roundtrip_pure_python(codec):
    buf = encode_container(ROWS, SCHEMA, codec=codec, rows_per_block=2)
    schema_back, rows_back = decode_container(buf)
    assert rows_back == ROWS
    assert schema_back.simpleString() == SCHEMA.simpleString()


def test_schema_mapping_inverse():
    avro = spark_to_avro_schema(SCHEMA)
    assert avro["type"] == "record"
    back = avro_to_spark_schema(avro)
    assert back.simpleString() == SCHEMA.simpleString()
    assert [f.nullable for f in back.fields] == [
        f.nullable for f in SCHEMA.fields
    ]
    with pytest.raises(ValueError):
        spark_to_avro_schema(
            T.StructType(
                [T.StructField("m", T.MapType(T.StringType(), T.LongType()))]
            )
        )


def test_spark_roundtrip_and_distribution(spark, tmp_path):
    """write_avro produces one container per partition; read_avro
    reproduces values and schema exactly."""
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) / 4, i % 2 == 0) for i in range(100)],
        "id bigint, name string, score double, flag boolean",
    ).repartition(4)
    dest = str(tmp_path / "avro_tbl")
    manifest = write_avro(df, dest)
    files = sorted(glob.glob(os.path.join(dest, "*.avro")))
    assert len(files) == 4  # one per (non-empty) partition
    assert sum(m["rows"] for m in manifest) == 100
    back = read_avro(spark, dest)
    assert back.schema.simpleString() == df.schema.simpleString()
    want = {r.id: (r.name, r.score, r.flag) for r in df.collect()}
    got = {r.id: (r.name, r.score, r.flag) for r in back.collect()}
    assert got == want


def test_spark_roundtrip_nulls_dates_arrays(spark, tmp_path):
    rows = [
        (1, "a", datetime.date(2024, 1, 1),
         datetime.datetime(2024, 1, 1, 12, 0, 0, 5), [1.0, 2.0]),
        (2, None, None, None, []),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.StringType(), True),
                T.StructField("d", T.DateType(), True),
                T.StructField("ts", T.TimestampType(), True),
                T.StructField("vec", T.ArrayType(T.DoubleType(), False), True),
            ]
        ),
    )
    dest = str(tmp_path / "avro_nulls")
    write_avro(df, dest, codec="null")
    back = {r.id: r for r in read_avro(spark, dest).collect()}
    assert back[2].name is None and back[2].d is None and back[2].ts is None
    assert back[1].d == datetime.date(2024, 1, 1)
    assert back[1].ts == datetime.datetime(2024, 1, 1, 12, 0, 0, 5)
    assert list(back[1].vec) == [1.0, 2.0]
    assert list(back[2].vec) == []


def _jvm_read_avro(spark, path: str) -> list[dict]:
    """Read an Avro container with the REFERENCE JVM implementation
    (org.apache.avro on Spark's classpath) — cross-implementation
    parity oracle. GenericRecord.toString() is the record as JSON."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    out = []
    while reader.hasNext():
        out.append(json.loads(reader.next().toString()))
    reader.close()
    return out


def test_jvm_reference_reads_our_files(spark, tmp_path):
    """Files written by the pure-Python encoder must be readable by the
    Apache reference implementation, byte-level spec conformance, both
    codecs."""
    df = spark.createDataFrame(
        [(1, "x", 0.5, True), (2, None, None, False)],
        "id bigint, name string, score double, flag boolean",
    ).coalesce(1)
    for codec in ("null", "deflate"):
        dest = str(tmp_path / f"jvm_{codec}")
        write_avro(df, dest, codec=codec)
        (f,) = glob.glob(os.path.join(dest, "*.avro"))
        got = sorted(_jvm_read_avro(spark, f), key=lambda r: r["id"])
        assert got[0] == {
            "id": 1, "name": "x", "score": 0.5, "flag": True
        }
        assert got[1] == {
            "id": 2, "name": None, "score": None, "flag": False
        }


def test_we_read_jvm_written_files(spark, tmp_path):
    """Files written by the Apache reference implementation must decode
    identically in the pure-Python reader (the other parity
    direction)."""
    jvm = spark._jvm
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["null", "string"]},
            ],
        }
    )
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    path = str(tmp_path / "jvm_written.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(sch, jvm.java.io.File(path))
    for i, name in ((1, "a"), (2, None), (3, "c")):
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("id", i)
        rec.put("name", name)
        writer.append(rec)
    writer.close()
    with open(path, "rb") as f:
        schema_back, rows = decode_container(f.read())
    assert schema_back.simpleString() == "struct<id:bigint,name:string>"
    assert rows == [
        {"id": 1, "name": "a"},
        {"id": 2, "name": None},
        {"id": 3, "name": "c"},
    ]


def test_write_avro_rejects_unsupported(spark):
    df = spark.createDataFrame([({"a": 1},)], "m map<string,bigint>")
    with pytest.raises(ValueError, match="unsupported"):
        write_avro(df, "/tmp/never_written")
    with pytest.raises(ValueError, match="codec"):
        write_avro(df.select(F.lit(1).alias("x")), "/tmp/nw2", codec="xz")