"""Cross-engine stable hashing.

Every near-dup / fingerprint operator needs a deterministic 64-bit hash
that (a) runs JVM-side in Spark (no Python UDF in the hot path) and
(b) is reproducible in ANSI SQL for the DuckDB oracle. Engine-native
hashes differ (Spark xxhash64 vs DuckDB hash), so the engine standard
is: md5 hex → first 15 hex digits → integer (60 bits, always positive,
< 2^63 so BIGINT-safe in both engines).

DuckDB equivalent of stable_hash64(x):
    CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

Derived keyed hashes (for minhash families) permute the stable hash
with odd multipliers modulo a Mersenne prime — again exact integer
arithmetic in both engines (all intermediates < 2^63).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# SQL fragment templates, formatted with a column/expression string.
STABLE_HASH64_SQL = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

MERSENNE61 = (1 << 61) - 1


def stable_hash64(col: Column) -> Column:
    """64-bit-ish (60-bit) stable content hash; see module doc."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def keyed_hash(h: Column, a: int, b: int) -> Column:
    """Universal-hash permutation (a*h + b) mod M61 of an existing
    stable hash. a must be odd and < 2^31 so a*h < 2^92... — to stay in
    BIGINT range both engines compute ((a * (h % 2^31)) + (a * (h >> 31))
    is overkill; instead keep h to 60 bits and a < 8: overflow-free is
    guaranteed only for a*h < 2^63, so use a ∈ small odd ints and fold:
    we reduce h mod 2^40 first (a < 2^22 ⇒ product < 2^62)."""
    h40 = h % F.lit(1 << 40)
    return (h40 * F.lit(a) + F.lit(b)) % F.lit(MERSENNE61)


def keyed_hash_sql(h_expr: str, a: int, b: int) -> str:
    """DuckDB mirror of keyed_hash."""
    return f"((({h_expr}) % {1 << 40}) * {a} + {b}) % {MERSENNE61}"
