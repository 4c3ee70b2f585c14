#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev tool only; the
engine itself never uses Python). Reads Verify.scala's output dir
(<out>/<query>/ parquet + oracle_sql.json), runs each oracle SQL in DuckDB
over the same sf dir's parquet tables, and compares: row count, column
names, RESULT-COLUMN TYPES, and values (sorted columns, sorted rows, float
tolerance).

The type check exists because the driver's hasher is type-sensitive: a
DuckDB windowed sum(BIGINT) is HUGEINT while the engine writes BIGINT, so
equal values hash differently and the driver reports hash_match:false even
though every cell matches (this burned q97 in round 6). Any oracle column
whose DuckDB type family differs from the engine parquet's type family
(as seen through DuckDB's read_parquet) fails loudly here, before the
driver ever sees it. Fix is always on the oracle side: CAST the aggregate
(HUGEINT/DECIMAL -> BIGINT, FLOAT -> DOUBLE) to match the engine schema.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_family(t):
    """Collapse a DuckDB type name to the family the driver's hasher
    distinguishes. The equivalence classes are EMPIRICAL, from driver
    rounds: INT8/16/32/64 widths hash identically (20 queries ship an
    INTEGER engine column against a BIGINT oracle column and were
    hash_match:true in CORRECTNESS_r06), while HUGEINT vs BIGINT broke
    q97 — so integer widths collapse to one family and HUGEINT, DECIMAL,
    FLOAT and DOUBLE each stay their own."""
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    if s.startswith("DECIMAL"):
        return "DECIMAL"
    return s


def norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int,)):
        return ("n", float(v))
    if isinstance(v, float):
        return ("n", v)
    return ("s", str(v))


# The segmented-scan EWMA family (q196/q201) computes the recurrence by a
# different-but-equivalent float path than the oracle's sequential
# list_reduce fold: raw divergence is ~1e-10 relative (spec-bounded), and
# both sides quantize at 4dp for the driver's hash gate. A raw value
# within ~1e-10 of a 0.00005 grid boundary can therefore round to
# ADJACENT 4dp values — a benign boundary straddle (~2e-8 per-value
# probability), not a regression. For these columns ONLY, a difference of
# exactly one 1e-4 grid step passes with a warning; anything larger still
# fails. Two guards keep the gate's power: (a) rows for these queries are
# sorted with the straddle columns LAST, so a straddled value cannot
# shift the row pairing and misalign the whole compare; (b) the allowance
# is CAPPED at max(2, 1% of rows) — a systematic one-step shift (a
# rounding-mode or quantization-offset bug moves EVERY value by one
# step, not "many") still fails. q198's streaming EWMA is a per-event
# sequential fold, bit-identical to the oracle's, so it is NOT listed:
# any mismatch there is a genuine bug.
GRID_STRADDLE_COLS = {
    "q196_ewma": {"ewma_last"},
    "q201_ewma_bucketed": {"ewma_last"},
}
GRID_STEP = 1e-4


def straddle_cap(n_rows):
    return max(2, n_rows // 100)


def close(a, b, straddle_ok=False):
    if a[0] != b[0]:
        # allow int/float cross-type numeric compare
        return False
    if a[0] == "n":
        x, y = a[1], b[1]
        if math.isnan(x) and math.isnan(y):
            return True
        if math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
            return True
        if straddle_ok and math.isclose(abs(x - y), GRID_STEP,
                                        rel_tol=1e-6):
            return "straddle"
        return False
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: engine output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if [c.lower() for c in got_cols] != [c.lower() for c in exp_cols]:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        # Type drift: the driver's hasher is type-sensitive, so the oracle
        # must produce the SAME column types as the engine parquet.
        got_types = dict(zip(got.columns, got.types))
        exp_types = dict(zip(exp.columns, exp.types))
        drift = [
            (gc, str(got_types[gc]), str(exp_types[ec]))
            for gc, ec in zip(got_cols, exp_cols)
            if type_family(got_types[gc]) != type_family(exp_types[ec])]
        if drift:
            details = ", ".join(
                f"{c}: engine {g} vs oracle {e}" for c, g, e in drift)
            print(f"FAIL {name}: TYPE DRIFT ({details}) — CAST the oracle "
                  f"column(s) to the engine type")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        # reorder values to sorted-column order, then sort rows
        straddle_cols = GRID_STRADDLE_COLS.get(name, set())
        # straddle columns sort LAST so a one-step value difference can
        # never reorder rows differently on the two sides and misalign
        # every later pairing (they're tie-breakers, and the non-straddle
        # columns are the row identity for these queries)
        pairs = list(zip(got_cols, exp_cols))  # sorted lists, paired by position
        pairs = ([p for p in pairs if p[0] not in straddle_cols] +
                 [p for p in pairs if p[0] in straddle_cols])
        cmp_cols = [p[0] for p in pairs]
        gperm = [got.columns.index(p[0]) for p in pairs]
        eperm = [exp.columns.index(p[1]) for p in pairs]
        g = sorted([norm(r[i]) for i in gperm] for r in got_rows)
        e = sorted([norm(r[i]) for i in eperm] for r in exp_rows)
        if straddle_cols:
            # straddle-last sorting assumes the NON-straddle columns are a
            # unique row key: if two rows tied on them, a one-grid-step
            # straddle could swap their order on one side only and turn a
            # benign straddle into a misaligned hard FAIL. Enforce the
            # assumption loudly instead of relying on it.
            n_key = len(cmp_cols) - len(straddle_cols)
            keys = [tuple(r[:n_key]) for r in g]
            if len(set(keys)) != len(keys):
                print(f"FAIL {name}: non-straddle key columns "
                      f"{cmp_cols[:n_key]} are not unique — straddle-last "
                      f"row sorting is unsound for this query")
                n_fail += 1
                continue
        bad = None
        straddles = 0
        for i, (gr, er) in enumerate(zip(g, e)):
            for c, a, b in zip(cmp_cols, gr, er):
                r = close(a, b, straddle_ok=c in straddle_cols)
                if r == "straddle":
                    straddles += 1
                elif not r:
                    bad = (i, gr, er)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: first diff at sorted row {bad[0]}:\n"
                  f"  got {bad[1]}\n  exp {bad[2]}")
            n_fail += 1
        elif straddles > straddle_cap(len(got_rows)):
            print(f"FAIL {name}: {straddles} one-grid-step differences "
                  f"exceed the straddle cap "
                  f"({straddle_cap(len(got_rows))}) — a systematic "
                  f"quantization shift, not boundary noise")
            n_fail += 1
        else:
            note = (f" [{straddles} benign 4dp boundary straddle(s) — "
                    f"see GRID_STRADDLE_COLS]" if straddles else "")
            print(f"PASS {name} ({len(got_rows)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
