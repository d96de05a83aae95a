"""Cross-engine stable hashing.

Every near-dup / fingerprint operator needs a deterministic 64-bit hash
that (a) runs JVM-side in Spark (no Python UDF in the hot path) and
(b) is reproducible in ANSI SQL for the DuckDB oracle. Engine-native
hashes differ (Spark xxhash64 vs DuckDB hash), so the engine standard
is: md5 hex → first 15 hex digits → integer (60 bits, always positive,
< 2^63 so BIGINT-safe in both engines).

DuckDB equivalent of stable_hash64(x):
    CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

Derived keyed hashes (for minhash families) re-hash the stable hash
under a per-permutation seed via md5 — see keyed_hash for why the
earlier affine mod-Mersenne scheme was abandoned (it never wrapped,
so it was monotone and degenerate).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# SQL fragment templates, formatted with a column/expression string.
STABLE_HASH64_SQL = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

def stable_hash64(col: Column) -> Column:
    """64-bit-ish (60-bit) stable content hash; see module doc."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def keyed_hash(h: Column, a: int, b: int) -> Column:
    """Seeded re-hash of an existing stable hash: md5 of
    '<a>:<b>:<h>' → 60-bit integer. (a, b) act as the permutation seed.

    Why not arithmetic (a*h + b) mod M61: with h reduced to 40 bits for
    BIGINT overflow safety, any a < 2^21 keeps a*h + b BELOW the
    modulus — the map never wraps, so it is MONOTONE in h, every
    "permutation" shares the same argmin, and an 8-perm MinHash
    degenerates to one minimum repeated 8× (measured: est_jaccard ≡ 1.0
    on every LSH candidate pair; x_minhash_accuracy_audit is the
    regression gate). A seeded cryptographic re-hash gives genuinely
    independent permutations and is exactly reproducible in both
    engines (md5 is bit-identical everywhere); the cost is one md5 per
    (row, seed), JVM-side, scan-local."""
    seed = f"{a}:{b}:"
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), h.cast("string"))), 1, 15), 16, 10
    ).cast("long")


def keyed_hash_col(h: Column, seed_col: Column, b: int) -> Column:
    """keyed_hash with a COLUMN seed (e.g. a sketch depth produced by
    posexplode) instead of a literal: md5 of '<seed>:<b>:<h>' → 60-bit
    integer. SQL mirror:
    CAST(('0x' || substr(md5(CAST(seed AS VARCHAR) || ':<b>:' ||
    CAST(h AS VARCHAR)), 1, 15)) AS BIGINT)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(seed_col.cast("string"), F.lit(f":{b}:"), h.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def keyed_hash_sql(h_expr: str, a: int, b: int) -> str:
    """DuckDB mirror of keyed_hash."""
    return (
        f"CAST(('0x' || substr(md5('{a}:{b}:' || "
        f"CAST(({h_expr}) AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
