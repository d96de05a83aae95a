"""Cross-engine exact rounding.

Engine-native round() is NOT portable: for x = 49700.854999999996 (an
exact double), DuckDB's round(x, 2) yields 49700.86 (it rounds the
shortest decimal representation ".855") while Spark yields 49700.85
(BigDecimal of the exact binary value, HALF_UP). Any oracle comparison
of rounded floats can therefore flip near .xx5 boundaries — observed in
practice at sf0.1.

The portable form is to make BOTH engines evaluate the same IEEE
expression: hround(x, n) = floor(x * 10^n + 0.5) / 10^n. Every step
(multiply, add, floor, divide) is correctly rounded and deterministic,
so bit-identical inputs give bit-identical outputs on every engine.
(Halves round toward +inf on both sides — consistency is what matters,
not the tie direction.)

registry.query() rewrites `round(expr, n)` in oracle SQL to this form
automatically (rewrite_round_sql), so queries keep writing natural
`round(...)` in their oracles; Spark code uses hround directly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hround(col: Column | str, n: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    m = float(10**n)
    return F.floor(c * F.lit(m) + F.lit(0.5)) / F.lit(m)


# --- Order-independent (decimal-accumulated) sums -------------------------
#
# hround fixes *rounding* divergence but cannot fix *summation-order*
# divergence: Spark and DuckDB add partial aggregates in different orders,
# so sum(double) can differ by 1 ulp, and near a .xx5 boundary that flips
# the rounded cent (observed: tpch_q3 at sf0.01, 2/1657 groups off by
# $0.01). The cure is to accumulate exactly: cast each term to DECIMAL
# (exact, commutative addition), round half-up in integer space while the
# value is still exact, and only then convert the small integer to double
# (a single correctly-rounded step on both engines — verified identical).
#
# Guard scale 6 gives two digits of slack beyond the 4 true decimals of
# TPC-H money products, so the double→decimal cast never sits on a
# rounding boundary either.

_HALF = '0.5'


def dsum(col: Column | str, n: int = 2, guard: str = "decimal(18,6)") -> Column:
    """Exact order-independent sum of a double expression, rounded
    half-up to `n` digits, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    m = 10**n
    scaled = F.floor(
        F.sum(c.cast(guard)) * F.lit(m) + F.lit(_HALF).cast("decimal(2,1)")
    )
    return scaled.cast("double") / F.lit(float(m))


def dsum_sql(expr: str, n: int = 2, guard: str = "DECIMAL(18,6)") -> str:
    """DuckDB mirror of dsum — byte-identical arithmetic."""
    m = 10**n
    return (
        f"(CAST(floor(sum(CAST(({expr}) AS {guard})) * {m} + 0.5) AS DOUBLE)"
        f" / {m})"
    )


def dsum_over(col: Column | str, window, n: int = 2,
              guard: str = "decimal(18,6)") -> Column:
    """Windowed dsum (running/frame sums of money columns)."""
    c = F.col(col) if isinstance(col, str) else col
    m = 10**n
    scaled = F.floor(
        F.sum(c.cast(guard)).over(window) * F.lit(m)
        + F.lit(_HALF).cast("decimal(2,1)")
    )
    return scaled.cast("double") / F.lit(float(m))


def dsum_over_sql(expr: str, over: str, n: int = 2,
                  guard: str = "DECIMAL(18,6)") -> str:
    m = 10**n
    return (
        f"(CAST(floor(sum(CAST(({expr}) AS {guard})) OVER {over} * {m}"
        f" + 0.5) AS DOUBLE) / {m})"
    )


def davg(col: Column | str, n: int = 6, guard: str = "decimal(18,6)") -> Column:
    """Order-independent average: exact decimal numerator, then ONE
    decimal→double conversion (correctly rounded on both engines while
    the scaled integer is < 2^53), an IEEE division by the non-null
    count, and hround. Every float step sees bit-identical inputs on
    both engines, so the result is deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    return hround(F.sum(c.cast(guard)).cast("double") / F.count(c), n)


def davg_sql(expr: str, n: int = 6, guard: str = "DECIMAL(18,6)") -> str:
    inner = (
        f"CAST(sum(CAST(({expr}) AS {guard})) AS DOUBLE) / count({expr})"
    )
    return hround_sql(inner, n)


def davg_over(col: Column | str, window, n: int = 6,
              guard: str = "decimal(18,6)") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return hround(
        F.sum(c.cast(guard)).over(window).cast("double")
        / F.count(c).over(window),
        n,
    )


def davg_over_sql(expr: str, over: str, n: int = 6,
                  guard: str = "DECIMAL(18,6)") -> str:
    inner = (
        f"CAST(sum(CAST(({expr}) AS {guard})) OVER {over} AS DOUBLE)"
        f" / count({expr}) OVER {over}"
    )
    return hround_sql(inner, n)


def hround_sql(expr: str, n: int) -> str:
    m = float(10**n)
    return f"(floor(({expr}) * {m} + 0.5) / {m})"


def rewrite_round_sql(sql: str) -> str:
    """Replace every `round(EXPR, N)` in a SQL string with the portable
    floor form, handling nested parentheses. N must be an integer
    literal (every oracle in this repo follows that)."""
    out = []
    i = 0
    low = sql.lower()
    while True:
        j = low.find("round(", i)
        # skip identifiers ending in 'round(' that aren't bare round()
        while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            j = low.find("round(", j + 1)
        if j == -1:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i:j])
        depth = 0
        k = j + len("round(")
        arg_start = k
        last_comma = -1
        while True:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                last_comma = k
            k += 1
        if last_comma == -1:
            # round(x) — integer round; leave untouched (not used for floats)
            out.append(sql[j : k + 1])
        else:
            expr = sql[arg_start:last_comma]
            n = int(sql[last_comma + 1 : k].strip())
            inner = rewrite_round_sql(expr)  # handle nested round()
            out.append(hround_sql(inner, n))
        i = k + 1
