"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at the given sf,
compare row count + column names + order-insensitive value hash.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [only_query...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402
from olake_spark.session import get_spark  # noqa: E402
from olake_spark.sources.tpch import TABLES  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return "\\N"
    return str(v)


def value_hash(rows: list[dict], cols: list[str]) -> str:
    cols = sorted(cols)
    lines = sorted("|".join(norm_cell(r[c]) for c in cols) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # the ANN oracles embed candidate ids computed from the oracle's
    # parquet — point them at the sf under test (driver default: sf0.01)
    import os

    os.environ["OLAKE_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark("check-oracles", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            otypes = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
            orows = [dict(zip(ocols, row)) for row in rel.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        # The driver's comparator is type-sensitive (it hashes Arrow-typed
        # values): DuckDB HUGEINT/DECIMAL vs Spark BIGINT/DOUBLE mismatches
        # even when Python-level values agree. Flag any widened oracle type.
        stypes = dict(sdf.dtypes)
        for c, ot in otypes.items():
            st = stypes.get(c, "")
            if "HUGEINT" in ot or "INT128" in ot:
                problems.append(f"oracle col {c} is {ot} — CAST ... AS BIGINT")
            elif ot.startswith("DECIMAL") and not st.startswith("decimal"):
                problems.append(f"oracle col {c} is {ot} but spark is {st}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show first differing line
                sl = sorted(
                    "|".join(norm_cell(r[c]) for c in sorted(scols)) for r in srows
                )
                ol = sorted(
                    "|".join(norm_cell(r[c]) for c in sorted(ocols)) for r in orows
                )
                for a, b in zip(sl, ol):
                    if a != b:
                        problems.append(f"  spark : {a[:160]}")
                        problems.append(f"  duckdb: {b[:160]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]) + f" [{time.time()-t0:.1f}s]")
            for p in problems[1:]:
                print("      " + p)
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAIL")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
