"""Dialect-portability probe: Spark SQL vs DuckDB on scalar edge
cases.

The registry's oracle discipline (queries.py header: DECIMAL sums,
round(…,6)+0.0, md5 hashing, BIGINT casts, ISO timestamps) exists
because the two engines disagree on specific scalar semantics. This
probe MEASURES the disagreement surface: a battery of edge-case
expressions evaluated in both engines, reported as AGREE / DIVERGE /
ERROR-ASYMMETRY. The output is the evidence behind PORTABILITY.md —
when writing a new oracle, consult that table before using a
function.

Usage: python scripts/probe_dialect.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb

#: (label, sql_expression) — evaluated as SELECT <expr> AS v in both.
BATTERY = [
    # --- substring indexing
    ("substr zero start", "substr('abcdef', 0, 3)"),
    ("substr negative start", "substr('abcdef', -2, 2)"),
    ("substr past end", "substr('abcdef', 10, 3)"),
    ("substr len overrun", "substr('abcdef', 4, 99)"),
    # --- casts
    ("cast float->int rounding", "CAST(CAST(3.7 AS DOUBLE) AS INTEGER)"),
    ("cast neg float->int", "CAST(CAST(-3.7 AS DOUBLE) AS INTEGER)"),
    ("cast bad string->int", "TRY_CAST('abc' AS INTEGER)"),
    ("cast numeric string->int", "CAST('42' AS INTEGER)"),
    ("cast decimal string->int", "TRY_CAST('4.9' AS INTEGER)"),
    # --- null propagation in string builders
    ("concat with null", "concat('a', NULL, 'b')"),
    ("pipe concat with null", "'a' || NULL"),
    ("concat_ws with null", "concat_ws('-', 'a', NULL, 'b')"),
    # --- rounding
    ("round half positive", "round(2.5)"),
    ("round half negative", "round(-2.5)"),
    ("round double 6dp", "round(CAST(1.0000005 AS DOUBLE), 6)"),
    ("round decimal 2dp", "round(CAST(2.345 AS DECIMAL(10,3)), 2)"),
    # --- arithmetic
    ("int division", "7 / 2"),
    ("int div operator", "7 // 2" ),
    ("negative modulo", "(-7) % 3"),
    ("double div by zero", "CAST(1 AS DOUBLE) / CAST(0 AS DOUBLE)"),
    # --- math edge
    ("ln of zero", "ln(0.0)"),
    ("sqrt of negative", "sqrt(-1.0)"),
    ("power 0^0", "power(0, 0)"),
    # --- greatest/least with null
    ("greatest with null", "greatest(1, NULL, 3)"),
    ("least with null", "least(1, NULL, 3)"),
    # --- case sensitivity / unicode
    ("upper sharp s", "upper('straße')"),
    ("length of unicode", "length('éé')"),
    # --- trim family
    ("trim custom chars", "trim('x' FROM 'xxaxx')"),
    ("lpad truncates", "lpad('abcdef', 3, '0')"),
    # --- array
    ("split + index", "split('a,b,c', ',')[1]"),
    ("element_at oob", "element_at(split('a,b', ','), 9)"),
    # --- comparison
    ("trailing space equality", "'a' = 'a '"),
    ("empty in-list null", "NULL IN (1, 2)"),
]


def main() -> int:
    from strava_etl_public_spark.session import get_spark

    spark = get_spark(cpus=2)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()

    agree = diverge = asym = 0
    print(f"{'case':28s} {'spark':>22s} {'duckdb':>22s}  verdict")
    for label, expr in BATTERY:
        sql = f"SELECT {expr} AS v"
        res = {}
        for eng, run in (
            ("spark", lambda q: spark.sql(q).collect()[0][0]),
            ("duckdb", lambda q: con.execute(q).fetchone()[0]),
        ):
            try:
                res[eng] = ("ok", run(sql))
            except Exception as e:  # noqa: BLE001 — asymmetry IS the finding
                res[eng] = ("err", type(e).__name__)
        s_st, s_v = res["spark"]
        d_st, d_v = res["duckdb"]
        if s_st != d_st:
            verdict, asym = "ERROR-ASYM", asym + 1
        elif s_st == "err":
            verdict, agree = "both-error", agree + 1
        else:
            same = repr(s_v) == repr(d_v) or (
                isinstance(s_v, float)
                and isinstance(d_v, (int, float))
                and float(s_v) == float(d_v)
            ) or (
                isinstance(d_v, float)
                and isinstance(s_v, (int, float))
                and float(s_v) == float(d_v)
            )
            if same:
                verdict, agree = "agree", agree + 1
            else:
                verdict, diverge = "DIVERGE", diverge + 1
        print(f"{label:28s} {str(s_v)[:22]:>22s} {str(d_v)[:22]:>22s}  {verdict}")
    print(f"\n{agree} agree, {diverge} diverge, {asym} error-asymmetric "
          f"of {len(BATTERY)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
