"""Local stand-in for the driver's correctness gate: runs every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
given sf dir, then compares row count, column names, **Arrow-level
column types** (the driver's value hash is type-sensitive — a DuckDB
DECIMAL128 vs Spark BIGINT mismatch must fail HERE, not at the driver),
and an order-insensitive value multiset (floats compared exactly — the
query conventions are responsible for making that stable).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canonical_type(t: pa.DataType) -> str:
    """Collapse representation-only Arrow type differences that do NOT
    change serialized values: large vs regular string/binary, timestamp
    unit (both engines emit tz-naive microseconds for these queries),
    list vs large_list of the same element. Everything else — including
    decimal vs integer, int32 vs int64, float32 vs float64 — stays
    distinct, because the driver's value hash distinguishes them."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return f"timestamp[tz={t.tz}]"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{canonical_type(t.value_type)}>"
    return str(t)


def schema_mismatches(got: pa.Schema, exp: pa.Schema) -> list[str]:
    g = {f.name: canonical_type(f.type) for f in got}
    e = {f.name: canonical_type(f.type) for f in exp}
    out = []
    for name in sorted(set(g) | set(e)):
        if g.get(name) != e.get(name):
            out.append(f"{name}: spark={g.get(name)} oracle={e.get(name)}")
    return out


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from rust_timeseries_spark.session import build_spark

    spark = build_spark(app_name="oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    frozen = getattr(entrymod, "FROZEN_ORACLE_QUERIES", frozenset())
    # frozen oracles are per-scale-factor (oracle_frozen.SF_SQL); select
    # the entry matching this sf dir — compare SCALE FACTORS, not path
    # spellings, so a relative path or symlink still resolves
    frozen_sqls: dict[str, str] = {}
    try:
        import oracle_frozen

        this_sf_key = str(float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]))
        if hasattr(oracle_frozen, "SF_SQL"):
            frozen_sqls = oracle_frozen.SF_SQL.get(this_sf_key, {})
        elif float(oracle_frozen.SF) == float(this_sf_key):
            frozen_sqls = {q: oracles[q] for q in frozen if q in oracles}
    except (ImportError, ValueError):
        pass
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in frozen:
            if name not in frozen_sqls:
                print(f"[skip] {name}: no frozen oracle generated for this sf "
                      "(run tools/gen_frozen_oracles.py)")
                continue
            oracles = {**oracles, name: frozen_sqls[name]}
        sf_limits = getattr(entrymod, "ORACLE_SF_LIMITS", {})
        try:
            sf_val = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
        except ValueError:
            sf_val = None
        if name in sf_limits and sf_val is not None and sf_val > sf_limits[name]:
            # the live RECURSIVE-CTE oracle is impractical here, but a
            # per-SF frozen recompute (gen_frozen_oracles) substitutes
            # when generated — the sweep checks values instead of skipping
            if name in frozen_sqls:
                oracles = {**oracles, name: frozen_sqls[name]}
            else:
                print(f"[skip] {name}: oracle impractical above sf{sf_limits[name]} "
                      "(see ORACLE_SF_LIMITS; run tools/gen_frozen_oracles.py "
                      "to freeze a recompute for this sf)")
                continue
        try:
            got_tbl = fn(spark, sf_dir).toArrow()
            got = normalize(got_tbl.to_pandas())
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp_tbl = con.execute(oracles[name]).arrow()
            exp = normalize(exp_tbl.to_pandas())
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: duckdb error {type(e).__name__}: {e}")
            continue
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            ok = False
        type_bad = schema_mismatches(got_tbl.schema, exp_tbl.schema)
        if type_bad:
            print(f"[FAIL] {name}: arrow type mismatch — " + "; ".join(type_bad))
            ok = False
        elif len(got) != len(exp):
            print(f"[FAIL] {name}: rows spark={len(got)} oracle={len(exp)}")
            ok = False
        else:
            for c in got.columns:
                a, b = got[c], exp[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = ((a == b) | (a.isna() & b.isna())).all()
                else:
                    eq = (a.astype(str).fillna("¤") == b.astype(str).fillna("¤")).all()
                if not eq:
                    bad = (~((a == b) | (a.isna() & b.isna()))).to_numpy().nonzero()[0][:5]
                    print(f"[FAIL] {name}: column {c} differs at rows {bad.tolist()}")
                    print("  spark :", a.iloc[bad].tolist())
                    print("  oracle:", b.iloc[bad].tolist())
                    ok = False
        if ok:
            print(f"[ok] {name}: {len(got)} rows, {len(got.columns)} cols")
        else:
            failures.append(name)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
