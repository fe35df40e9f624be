"""Portable (cross-engine) hash family for oracle-checkable LLM operators.

The fast paths hash with xxhash64 — JVM-side, cheap, but Spark-specific,
so minhash/simhash/LSH results can only get rows-only driver checks.  The
portable family derives the same-width integers from md5, which DuckDB
computes byte-identically:

    Spark : conv(substring(md5(s), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substring(md5(s), 1, 15))::BIGINT

15 hex chars = 60 bits, always non-negative, so % / pmod agree and
products against 31-bit constants stay inside a signed long (ANSI-safe).
Each hash-dependent operator takes `portable=True` to switch families;
defaults stay on xxhash64 (at 100 TB md5 in the shingle hot loop is a real
cost — the portable variants exist to PROVE the algorithm against a second
engine, the fast variants to run it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int60(col: Column) -> Column:
    """60-bit non-negative bigint from md5 — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int60_sql(expr: str) -> str:
    """The DuckDB spelling of md5_int60 for oracle SQL strings."""
    return f"('0x' || substring(md5({expr}), 1, 15))::BIGINT"
