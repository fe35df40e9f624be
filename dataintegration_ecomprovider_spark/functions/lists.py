"""Comma-quoted list columns — the reference data model's signature encoding.

Multi-valued relations are flattened onto the parent row as
`"v1","v2","v3"` strings (produced by STUFF(... FOR XML PATH('')), reference
src/EcomSourceReader.cs:393; parsed by SplitOnComma which splits on ',' and
trims '"', src/EcomDestinationWriter.cs:1508-1521).  Composite variant keys
are dot-joined (`VO1.VO7`, split on '.', src/EcomDestinationWriter.cs:1324).

Engine-side the natural representation is ArrayType; these helpers encode /
decode at the boundary.  All pure built-in column expressions — they stay
inside whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def encode_quoted_list(arr: Column) -> Column:
    """array<string> -> ',"v1","v2"'-style string (empty string for empty/null).

    Mirrors the FOR XML PATH('') emission at src/EcomSourceReader.cs:336-352
    after the reference's STUFF strips the leading comma.
    """
    return F.when(arr.isNull() | (F.size(arr) == 0), F.lit("")).otherwise(
        F.concat_ws(",", F.transform(arr, lambda v: F.concat(F.lit('"'), v, F.lit('"'))))
    )


def decode_quoted_list(col: Column) -> Column:
    """'"v1","v2"' string -> array<string>, exactly SplitOnComma
    (src/EcomDestinationWriter.cs:1508-1521): split on ',' with
    RemoveEmptyEntries (leading/double commas drop out), then Trim('"') —
    ALL leading/trailing double-quote chars, and ONLY quote chars (interior
    whitespace survives, so ' "b"' keeps its leading space and the quote it
    shields).  Null input -> empty array (the C# null branch)."""
    return F.when(col.isNull(), F.array().cast("array<string>")).otherwise(
        F.transform(
            F.filter(F.split(col, ","), lambda v: v != ""),
            lambda v: F.regexp_replace(v, '^"+|"+$', ""),
        )
    )


def split_composite_key(col: Column) -> Column:
    """Dot-composite key 'VO1.VO7' -> array<string> (src/EcomDestinationWriter.cs:1324, :4483)."""
    return F.split(col, "\\.")
