"""Self-check harness approximating the driver's correctness gate:
runs ``queries()`` entries on Spark and their ``oracle_sql()`` twins
on DuckDB at the given scale factor, then compares row count, column
names, and an order-insensitive multiset of (rounded) values.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
       python tools/selfcheck.py --all [sf_dir] [query ...]

Default checks the curated driver registry (what the driver grades);
``--all`` checks the FULL plans.suite registry, including entries not
exposed to the driver (the same sweep tests/test_oracle_parity.py
runs at sf0.001).
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import traceback

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_val(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


#: Declared-type families for the per-column type comparison.  The
#: driver's value hash is tolerant of width/precision aliases — verified
#: empirically against CORRECTNESS_r03: timestamp_ntz↔TIMESTAMP
#: (active_programs), float↔DOUBLE (media_features) and
#: double↔DECIMAL (order_value_histogram) were all hash-green — but
#: NOT of types that leave int64 range: DuckDB HUGEINT converts to
#: float64/object on the pandas path, so an oracle with an uncast
#: ``sum()`` passes a values-only compare locally yet fails the driver
#: (round-3 ``stratified_sample``).  Flag exactly that class.
_TYPE_FAMILY = {
    # int64-representable integers: driver-equivalent
    "tinyint": "int", "smallint": "int", "int": "int", "integer": "int",
    "bigint": "int",
    # numerics the driver rounds before hashing: driver-equivalent
    "float": "num", "double": "num", "real": "num",
    # temporal
    "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts",
    "timestamp with time zone": "ts",
    # passthrough
    "string": "str", "varchar": "str",
    "boolean": "bool", "binary": "bin", "blob": "bin",
    # NO entry for hugeint / ubigint: they map to themselves and
    # mismatch every Spark type — the bug class this check exists for.
}


def type_family(t: str) -> str:
    t = str(t).strip().lower()
    if t.endswith("[]"):
        return f"array<{type_family(t[:-2])}>"
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{type_family(t[6:-1])}>"
    if t.startswith("decimal"):
        return "num"
    return _TYPE_FAMILY.get(t, t)


def type_mismatches(s_dtypes, d_cols, d_types):
    """Columns whose DuckDB declared type won't hash like Spark's."""
    duck = {c: type_family(t) for c, t in zip(d_cols, d_types)}
    out = []
    for col, st in s_dtypes:
        dtt = duck.get(col)
        if dtt is not None and dtt != type_family(st):
            out.append(f"{col}: spark={st} duck-family={dtt}")
    return out


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_val(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def oracle_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def check_queries(spark, con, qs, sqls, sf_dir, only=None, log=print):
    """Run each query against its oracle; returns the failing names."""
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_dtypes = sdf.dtypes
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            failures.append(name)
            log(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            continue
        if name not in sqls:
            log(f"ok?  {name}: rows-only ({len(s_rows)} rows, no oracle)")
            continue
        try:
            rel = con.sql(sqls[name])
            d_cols = list(rel.columns)
            d_types = [str(t) for t in rel.types]
            d_rows = rel.fetchall()
        except Exception:
            failures.append(name)
            log(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        else:
            tm = type_mismatches(s_dtypes, d_cols, d_types)
            if tm:
                problems.append("declared types differ (driver hash risk): " + ", ".join(tm))
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sm = row_multiset(s_cols, s_rows)
            dm = row_multiset(d_cols, d_rows)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            log(f"FAIL {name}: " + "; ".join(problems))
        else:
            log(f"PASS {name} ({len(s_rows)} rows)")
    return failures


def main() -> int:
    args = [a for a in sys.argv[1:]]
    use_all = "--all" in args
    if use_all:
        args.remove("--all")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from solana_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("selfcheck")
    con = oracle_connection(sf_dir)

    if use_all:
        from __spark_entry__ import _configure
        from solana_data_etl_pipeline_spark.plans.suite import all_oracle_sql, all_queries

        _configure(spark)
        qs, sqls = all_queries(), all_oracle_sql()
    else:
        from __spark_entry__ import oracle_sql, queries

        qs, sqls = queries(), oracle_sql()

    failures = check_queries(spark, con, qs, sqls, sf_dir, only=only)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
