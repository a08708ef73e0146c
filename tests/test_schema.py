"""Type-map and CSV schema-resolution tests (SURVEY §1.2, §2.1 S2-S4).

The reference's mapClickHouseType (server.js:57-85) silently degrades every
parametrized type to String; these tests pin our fixed behavior.
"""

from pyspark.sql import types as T

from clickhouse_flatfile_tool_spark import schema as S


def test_simple_types():
    assert S.clickhouse_to_spark("Int32") == (T.IntegerType(), False)
    assert S.clickhouse_to_spark("Int64") == (T.LongType(), False)
    assert S.clickhouse_to_spark("Float64") == (T.DoubleType(), False)
    assert S.clickhouse_to_spark("String") == (T.StringType(), False)
    assert S.clickhouse_to_spark("Date") == (T.DateType(), False)
    assert S.clickhouse_to_spark("DateTime") == (T.TimestampType(), False)
    assert S.clickhouse_to_spark("Bool") == (T.BooleanType(), False)


def test_unsigned_widening():
    # Spark has no unsigned types: widen one size; UInt64 → Decimal(20,0)
    assert S.clickhouse_to_spark("UInt8") == (T.ShortType(), False)
    assert S.clickhouse_to_spark("UInt16") == (T.IntegerType(), False)
    assert S.clickhouse_to_spark("UInt32") == (T.LongType(), False)
    assert S.clickhouse_to_spark("UInt64") == (T.DecimalType(20, 0), False)


def test_parametrized_types_not_degraded():
    # the reference bug (server.js:84): these all fell through to String
    assert S.clickhouse_to_spark("Nullable(Int32)") == (T.IntegerType(), True)
    assert S.clickhouse_to_spark("LowCardinality(String)") == (T.StringType(), False)
    assert S.clickhouse_to_spark("FixedString(16)") == (T.StringType(), False)
    assert S.clickhouse_to_spark("DateTime64(3)") == (T.TimestampType(), False)
    assert S.clickhouse_to_spark("Decimal(10, 2)") == (T.DecimalType(10, 2), False)
    assert S.clickhouse_to_spark("Enum8('a' = 1)") == (T.StringType(), False)


def test_nested_types():
    dt, nullable = S.clickhouse_to_spark("Array(UInt32)")
    assert dt == T.ArrayType(T.LongType(), containsNull=False)
    dt, _ = S.clickhouse_to_spark("Array(Nullable(String))")
    assert dt == T.ArrayType(T.StringType(), containsNull=True)
    dt, _ = S.clickhouse_to_spark("Map(String, UInt64)")
    assert dt == T.MapType(T.StringType(), T.DecimalType(20, 0), valueContainsNull=False)
    dt, _ = S.clickhouse_to_spark("Tuple(a Int32, b String)")
    assert dt == T.StructType(
        [T.StructField("a", T.IntegerType(), False), T.StructField("b", T.StringType(), False)]
    )


def test_unknown_falls_back_to_string():
    assert S.clickhouse_to_spark("SomeExoticType") == (T.StringType(), True)


def test_spark_to_clickhouse_roundtrip():
    assert S.spark_to_clickhouse(T.IntegerType()) == "Int32"
    assert S.spark_to_clickhouse(T.LongType(), nullable=True) == "Nullable(Int64)"
    assert S.spark_to_clickhouse(T.TimestampType()) == "DateTime64(6)"
    assert (
        S.spark_to_clickhouse(T.ArrayType(T.FloatType(), containsNull=False))
        == "Array(Float32)"
    )
    assert S.spark_to_clickhouse(T.DecimalType(20, 0)) == "Decimal(20, 0)"


def test_uk_property_preset():
    # filename rule from server.js:263-266; 16 columns from server.js:32-49
    r = S.resolve_csv_schema("pp-2024.csv")
    assert r.origin == "preset" and not r.has_header
    assert len(r.schema.fields) == 16
    assert r.schema.fields[0].name == "transaction_id"
    assert S.matches_uk_property_preset("UK-price-paid-full.csv")
    assert not S.matches_uk_property_preset("orders.csv")


def test_header_sniff():
    r = S.resolve_csv_schema("data.csv", first_line="id,name,email\n")
    assert r.origin == "header" and r.has_header
    assert [f.name for f in r.schema.fields] == ["id", "name", "email"]


def test_headerless_probe():
    # generic column_1..n naming (server.js:322-347)
    r = S.resolve_csv_schema("data.csv", first_line="1,foo,2.5\n")
    assert r.origin == "headerless" and not r.has_header
    assert [f.name for f in r.schema.fields] == ["column_1", "column_2", "column_3"]


def test_validate_columns():
    import pytest

    S.validate_columns([{"name": "a", "type": "String"}])
    with pytest.raises(ValueError):
        S.validate_columns([{"name": "a"}])


def test_cast_to_clickhouse_columns(spark):
    from pyspark.sql import types as T

    from clickhouse_flatfile_tool_spark.schema import cast_to_clickhouse_columns

    df = spark.createDataFrame(
        [("1", "25.5", "2024-01-02", "oops"), ("2", "bad", "2024-02-03", "7")],
        "id string, v string, d string, n string",
    )
    out = cast_to_clickhouse_columns(
        df,
        [
            {"name": "id", "type": "UInt32"},
            {"name": "v", "type": "Float64"},
            {"name": "d", "type": "Date"},
            {"name": "n", "type": "Nullable(Int32)"},
        ],
    )
    sch = {f.name: f.dataType for f in out.schema.fields}
    assert sch["id"] == T.LongType()  # UInt32 widens to Long
    assert sch["v"] == T.DoubleType()
    assert sch["d"] == T.DateType()
    assert sch["n"] == T.IntegerType()
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["v"] == 25.5 and rows[1]["n"] is None  # bad cell → NULL
    assert rows[2]["v"] is None and rows[2]["n"] == 7
    assert str(rows[1]["d"]) == "2024-01-02"


def test_schema_drift_detects_all_change_classes():
    from pyspark.sql import types as T

    from clickhouse_flatfile_tool_spark.schema import schema_drift

    old = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("legacy", T.IntegerType(), True),
        T.StructField("flag", T.IntegerType(), True),
    ])
    new = T.StructType([
        T.StructField("id", T.LongType(), True),          # nullability flip
        T.StructField("name", T.StringType(), True),
        T.StructField("flag", T.LongType(), True),        # widened type
        T.StructField("score", T.DoubleType(), True),     # added
    ])
    d = schema_drift(old, new)
    assert d["added"] == ["score"]
    assert d["removed"] == ["legacy"]
    assert d["type_changed"] == ["flag"]
    assert d["nullability_changed"] == ["id"]
    assert d["compatible"] is False
    # pure addition is compatible
    d2 = schema_drift(T.StructType(old.fields[:2]), old)
    assert d2["compatible"] is True and d2["added"] == ["flag", "legacy"]


def test_header_sniff_is_quote_aware():
    from clickhouse_flatfile_tool_spark.schema import resolve_csv_schema

    r = resolve_csv_schema("x.csv", 'id,"full, name",notes\n')
    assert [f.name for f in r.schema.fields] == ["id", "full, name", "notes"]
    assert r.has_header


def test_header_sniff_dedupes_duplicate_names():
    from clickhouse_flatfile_tool_spark.schema import resolve_csv_schema

    r = resolve_csv_schema("x.csv", "id,id,value\n", has_header=True)
    assert [f.name for f in r.schema.fields] == ["id", "id_2", "value"]


def test_explicit_has_header_beats_preset():
    from clickhouse_flatfile_tool_spark.schema import (
        UK_PROPERTY_COLUMNS,
        resolve_csv_schema,
    )

    # default: filename heuristic wins (reference semantics)
    preset = resolve_csv_schema("pp-2024.csv", "a,b\n")
    assert preset.origin == "preset" and not preset.has_header
    assert [f.name for f in preset.schema.fields] == UK_PROPERTY_COLUMNS
    # explicit caller knowledge overrides the substring heuristic
    r = resolve_csv_schema("pp-2024.csv", "a,b\n", has_header=True)
    assert r.origin == "header" and [f.name for f in r.schema.fields] == ["a", "b"]
