#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle pairs, mimicking the driver's gate:
run each oracle SQL in DuckDB over the sf parquet tables, load the Spark
result parquet, sort columns by name, sort rows, compare cell values
exactly (floats bit-for-bit, matching a hash compare).

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, re
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

ROUND_CALL = re.compile(r"(?<![A-Za-z0-9_])round\s*\(", re.IGNORECASE)

# r10 lint #2: a long plain-decimal literal (>= 15 significant digits, no
# exponent marker) types as DECIMAL, and DuckDB's DECIMAL->DOUBLE cast is
# NOT correctly rounded (int128 mantissa and 10^scale each round to
# double before the divide) -- inlined model state came back 1 ulp off
# (caught live on emb_incremental_neardups cos). Every generated literal
# must carry an exponent marker (VecOracle.dbl) so it parses through the
# correctly-rounded strtod DOUBLE path. Short constants (0.15, 1e6
# grids) are unaffected -- their decimal->double conversion is exact or
# sub-ulp-safe at few digits.
PLAIN_DECIMAL = re.compile(r"\d*\.\d{11,}(?![\deE])")

def lint_plain_decimal_literal(sql):
    m = PLAIN_DECIMAL.search(sql)
    if m:
        return (f"LINT: plain decimal literal {m.group(0)[:24]}... types as "
                "DECIMAL; DuckDB's DECIMAL->DOUBLE cast is not correctly "
                "rounded -- add an exponent marker (VecOracle.dbl)")
    return None

# r10 part 3: a list_reduce whose lambda builds a STRUCT accumulator is
# broken in DuckDB 1.0.0 -- from the second combine on, the reduce
# aliases the accumulator in place, so a later struct field's expression
# reads fields the earlier assignments ALREADY OVERWROTE (found live on
# the first ts_holt_linear oracle: acc.l inside the trend expression saw
# the new level). Later DuckDB versions may fix it, making the construct
# version-SENSITIVE either way. Scalar-accumulator folds (every sqL2/dot
# oracle) are unaffected -- the lambda reads acc exactly once.
def lint_struct_reduce(sql):
    low = sql.lower()
    # co-occurrence is the signal: every legitimate oracle reduce is a
    # scalar fold; struct_pack in the same statement as list_reduce means
    # a struct is flowing into/around a fold (nested parens defeat a
    # precise regex, and a false positive just forces the CTE form)
    if "list_reduce" in low and "struct_pack" in low:
        return ("LINT: list_reduce over a struct_pack accumulator -- DuckDB "
                "1.0.0 aliases the accumulator in place across combines "
                "(version-sensitive); use a recursive CTE for multi-variable "
                "recursions (the ts_holt_linear form)")
    return None

def wrap_round_args(sql):
    """Rewrite every ROUND(<arg>[, n]) so <arg> is wrapped in
    graft_lint_decimal(...). Paren-aware: finds the first top-level comma
    (or the closing paren for 1-arg round) of each call, innermost-last
    via repeated scanning."""
    while True:
        out, changed, i = [], False, 0
        for m in ROUND_CALL.finditer(sql):
            start = m.end()  # position just after '('
            # skip calls we already wrapped
            if sql[start:].lstrip().startswith("graft_lint_decimal("):
                continue
            depth, j = 1, start
            arg_end = None
            while j < len(sql) and depth > 0:
                c = sql[j]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        arg_end = j
                elif c == "," and depth == 1:
                    arg_end = j
                    break
                elif c == "'":  # skip string literal
                    j += 1
                    while j < len(sql) and sql[j] != "'":
                        j += 1
                j += 1
            if arg_end is None:
                continue
            sql = (sql[:start] + "graft_lint_decimal(" +
                   sql[start:arg_end] + ")" + sql[arg_end:])
            changed = True
            break  # restart scan: offsets shifted
        if not changed:
            return sql

def lint_round_on_double(con, sql):
    """r10 lint (VERDICT r9 item 2): ROUND applied to a non-DECIMAL
    argument in oracle SQL is the cross-version DuckDB seam that went
    driver-red on emb_kmeans/emb_covariance — double-ROUND digit-boundary
    behavior is implementation-defined across releases, while ROUND on a
    DECIMAL is exact integer arithmetic. Returns an error string or None.
    Mechanism: rewrite each ROUND's first argument through a macro that
    raises unless typeof(arg) is DECIMAL, then execute against the real
    tables so every call site is exercised with its real argument type."""
    if not ROUND_CALL.search(sql):
        return None
    try:
        con.execute(wrap_round_args(sql)).fetchall()
        return None
    except Exception as e:
        msg = str(e)
        if "LINT:" in msg:
            return msg[msg.index("LINT:"):].splitlines()[0]
        return f"lint rewrite failed to execute: {msg.splitlines()[0]}"

def canon(rows, cols):
    # sort columns by name, then rows lexicographically by repr
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=repr), [cols[i] for i in order]

def col_types(con, sql):
    """DuckDB column_name -> column_type for a query (via DESCRIBE)."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1].upper() for r in rows}

def cell_eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    con.execute(
        "CREATE MACRO graft_lint_decimal(x) AS CASE"
        " WHEN typeof(x) LIKE 'DECIMAL%' THEN x"
        " ELSE error('LINT: ROUND on non-DECIMAL ' || typeof(x)) END")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    fails = []
    for name in sorted(oracle):
        sql = oracle[name]
        lint = (lint_round_on_double(con, sql) or
                lint_plain_decimal_literal(sql) or lint_struct_reduce(sql))
        if lint:
            print(f"LINT     {name}: {lint}")
            n_fail += 1; fails.append(name); continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)"); n_fail += 1; fails.append(name); continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"ORAERR   {name}: {e}"); n_fail += 1; fails.append(name); continue
        s = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        if sorted(scols) != sorted(ocols):
            print(f"SCHEMA   {name}: spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1; fails.append(name); continue
        if len(srows) != len(orows):
            print(f"ROWS     {name}: spark={len(srows)} oracle={len(orows)}")
            n_fail += 1; fails.append(name); continue
        # Type check (driver's hash is type-sensitive): DESCRIBE both the
        # oracle SQL and the parquet read of the Spark dump — both land in
        # DuckDB's type system, so types must match exactly. Catches e.g.
        # uncast SUM(BIGINT) -> HUGEINT drift that value compare misses.
        try:
            otypes = col_types(con, sql)
            stypes = col_types(con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            tbad = [(c, stypes[c], otypes[c]) for c in sorted(otypes)
                    if stypes.get(c) != otypes[c]]
        except Exception as e:
            print(f"TYPERR   {name}: {e}"); n_fail += 1; fails.append(name); continue
        if tbad:
            print(f"TYPES    {name}:")
            for c, st, ot in tbad:
                print(f"         col {c}: spark={st} oracle={ot}")
            n_fail += 1; fails.append(name); continue
        sc, cols = canon(srows, scols)
        oc, _ = canon(orows, ocols)
        bad = None
        for i, (sr, orow) in enumerate(zip(sc, oc)):
            if not all(cell_eq(a, b) for a, b in zip(sr, orow)):
                bad = (i, sr, orow); break
        if bad:
            i, sr, orow = bad
            print(f"VALUES   {name}: first diff at sorted row {i}")
            for c, a, b in zip(cols, sr, orow):
                if not cell_eq(a, b):
                    print(f"         col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1; fails.append(name)
        else:
            print(f"PASS     {name} ({len(srows)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    if fails: print("FAILING:", " ".join(fails))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
