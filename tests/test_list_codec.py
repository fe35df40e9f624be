"""Reference-exact parity for the comma-quoted list codec.

Expected values mirror C# `SplitOnComma` (src/EcomDestinationWriter.cs:
1508-1521): `input.Split(',', RemoveEmptyEntries)` then `.Trim('"')` —
empty entries removed, ALL edge quotes trimmed, whitespace NOT trimmed —
and the dot-composite `Split('.')` (src/EcomDestinationWriter.cs:1324),
which KEEPS empty entries."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from dataintegration_ecomprovider_spark.functions.lists import (
    decode_quoted_list,
    encode_quoted_list,
    split_composite_key,
)

SPLIT_ON_COMMA_CASES = [
    ('"a","b"', ["a", "b"]),
    (',"a","b"', ["a", "b"]),          # leading comma: RemoveEmptyEntries
    ('"a",,"b"', ["a", "b"]),          # double comma
    ('"a", "b"', ["a", ' "b']),        # space blocks the leading-quote trim
    ('""a""', ["a"]),                  # Trim('"') strips ALL edge quotes
    ("a,b", ["a", "b"]),               # unquoted values pass through
    ('""', []),                        # '""' trims to empty string, kept? no:
                                       # Split gives ['""'] (non-empty), Trim -> ''
    ("", []),                          # empty input -> no entries
    (None, []),                        # null -> string[0]
    (",,,", []),
]


def test_decode_matches_reference_split_on_comma(spark):
    # '""' case: Split keeps the '""' entry (it is non-empty pre-trim), and
    # Trim('"') reduces it to '' — the C# output is [''] not [].
    expected = dict(SPLIT_ON_COMMA_CASES)
    expected['""'] = [""]
    rows = [(k,) for k in expected]
    df = spark.createDataFrame(
        rows, StructType([StructField("s", StringType(), True)])
    )
    got = df.select("s", decode_quoted_list(F.col("s")).alias("arr")).collect()
    for row in got:
        assert row["arr"] == expected[row["s"]], (row["s"], row["arr"])


def test_encode_decode_round_trip_on_clean_values(spark):
    df = spark.createDataFrame([(["g1", "g2", "g3"],), ([],), (None,)], "arr: array<string>")
    out = df.select(
        "arr", decode_quoted_list(encode_quoted_list(F.col("arr"))).alias("back")
    ).collect()
    for row in out:
        assert row["back"] == (row["arr"] or [])


def test_composite_dot_split_keeps_empty_entries(spark):
    df = spark.createDataFrame([("VO1.VO7",), ("VO1..VO7",), ("",)], "k: string")
    got = {r["k"]: r["arr"] for r in df.select("k", split_composite_key(F.col("k")).alias("arr")).collect()}
    assert got["VO1.VO7"] == ["VO1", "VO7"]
    assert got["VO1..VO7"] == ["VO1", "", "VO7"]  # C# Split('.') keeps empties
    assert got[""] == [""]
