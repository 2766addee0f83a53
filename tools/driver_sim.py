"""Simulate the driver's correctness gate locally.

Imports __spark_entry__ exactly as the driver does, smoke-runs entry(),
then runs every queries()[name] at the given sf_dir against its
oracle_sql()[name] via DuckDB: row-count + column-name + order-insensitive
value compare.

Usage: python tools/driver_sim.py [sf_dir] [query_name ...]
Passing query names restricts the run to those (entry() smoke included
only on full runs) — the fast loop when iterating on one oracle.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def _cell(v):
    """Dtype-sensitive cell repr, mirroring the real driver's pandas
    value-hash strictness (r3 lesson): int64 99111 and float64 99111.0
    MUST differ (DuckDB HUGEINT→float64 broke json_payload_stats), and
    floats compare at full precision, not %.10g."""
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "\x00na"
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))  # full precision; nan -> 'nan'
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "hex:" + bytes(v).hex()
    return str(v)


def canon(pdf):
    """Canonicalize a pandas frame the way the driver does: sort columns
    by name, factorize each column (raises TypeError on unhashable list
    cells — the collect_list_rollcall r3 failure mode), then emit sorted
    rows of dtype-sensitive cell reprs."""
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        pd.factorize(pdf[c])  # driver's hash path dies here on list cells
    rows = [tuple(_cell(v) for v in r) for r in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import duckdb

    import __spark_entry__ as E

    # Deliberately a BARE session (not our session.py factory): the round
    # driver builds its own SparkSession without our confs, and round 1's
    # gate failed on exactly that difference (nanosAsLong missing). Keep
    # only size/UI knobs here so the sim stays faithful.
    import os

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("driver_sim")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    if not only:
        t0 = time.time()
        edf = E.entry(spark)
        rows = edf.collect()
        print(f"entry(): {len(rows)} rows, schema={[f.name for f in edf.schema.fields]}, "
              f"{time.time()-t0:.1f}s")
        assert len(rows) >= 0

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            print("unknown queries:", unknown)
            return 2
        qs = {n: qs[n] for n in only}
    print(f"{len(qs)} queries, {len(oracles)} oracles")
    if not only:
        try:
            from sqlstreamstore_spark.entrypoints import gate_last_checked

            last = gate_last_checked()
        except Exception:
            last = {}
        cap = list(qs)[:50]
        print("driver ~50-row cap window (first 50 in dict order, "
              "name:last-checked-round, r0 = never):")
        print("  " + " ".join(f"{n}:r{last.get(n, 0)}" for n in cap))
    failures = []
    report: dict[str, dict] = {}
    from sqlstreamstore_spark.operators.positions import release_pins

    for name, fn in qs.items():
        release_pins()  # ADVICE r9 #4: previous gate's layout pins are
        # quiescent once its toPandas returned; don't accumulate cache
        # across a 285-gate selfcheck run.
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            sp_cols = sdf.columns
            sp_pdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            report[name] = {"status": "SPARK_ERROR", "err": str(e)[:200]}
            print(f"  {name}: SPARK ERROR {e}")
            continue
        if name not in oracles:
            report[name] = {
                "status": "ROWS_ONLY", "rows": len(sp_pdf),
                "s": round(time.time() - t0, 2),
            }
            print(f"  {name}: rows-only check, {len(sp_pdf)} rows, {time.time()-t0:.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            dk_pdf = res.fetchdf()
            dk_cols = list(dk_pdf.columns)
        except Exception as e:
            failures.append(name)
            print(f"  {name}: ORACLE ERROR {e}")
            continue
        ok_cols = sorted(sp_cols) == sorted(dk_cols)
        try:
            sp_s = canon(sp_pdf)
        except Exception as e:
            failures.append(name)
            print(f"  {name}: SPARK CANON ERROR {type(e).__name__}: {e}")
            continue
        try:
            dk_s = canon(dk_pdf)
        except Exception as e:
            failures.append(name)
            print(f"  {name}: ORACLE CANON ERROR {type(e).__name__}: {e}")
            continue
        ok_vals = sp_s == dk_s
        status = "OK" if (ok_cols and ok_vals) else "MISMATCH"
        if status != "OK":
            failures.append(name)
        report[name] = {
            "status": status, "rows": len(sp_s), "oracle_rows": len(dk_s),
            "cols_ok": ok_cols, "s": round(time.time() - t0, 2),
        }
        print(f"  {name}: {status} rows={len(sp_s)}/{len(dk_s)} cols_ok={ok_cols} {time.time()-t0:.1f}s")
        if not ok_vals and ok_cols:
            for a, b in zip(sp_s, dk_s):
                if a != b:
                    print(f"    first diff:\n      spark: {a}\n      duck : {b}")
                    break
            if len(sp_s) != len(dk_s):
                print(f"    row count differs: {len(sp_s)} vs {len(dk_s)}")
        if not ok_cols:
            print(f"    spark cols: {sorted(sp_cols)}\n    duck cols : {sorted(dk_cols)}")
    print("RESULT:", "ALL OK" if not failures else f"FAILURES: {failures}")
    # optional JSON artifact (DRIVER_SIM_JSON=path): the self-check the
    # round can commit — per-query status/rows/seconds with the same
    # compare the driver runs
    out_path = os.environ.get("DRIVER_SIM_JSON")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_queries": len(qs),
                 "failures": failures, "queries": report},
                f, indent=1,
            )
        print(f"wrote {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
        sys.argv[2:] or None,
    ))
