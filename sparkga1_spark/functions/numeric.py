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
