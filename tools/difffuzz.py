#!/usr/bin/env python3
"""Differential SQL fuzzer: seeded random queries from the dialect
intersection of Spark SQL and DuckDB, executed by BOTH engines over the
same parquet tables and value-compared with tools/check.py's
driver-shaped compare.

Usage: difffuzz.py [sfDir] [outDir] [--n N] [--seed S]

The grammar deliberately stays inside cross-engine-deterministic
territory (learned rules, enforced here):
  - integer aggregates only (SUM/COUNT/COUNT DISTINCT cast to BIGINT on
    both sides; DuckDB's HUGEINT sum would otherwise dtype-diverge);
  - NO SUM/AVG over doubles (summation order differs between engines —
    the one legitimate source of cross-engine float drift); MIN/MAX of
    doubles/timestamps are exact and allowed;
  - predicates draw constants from the column's real min/max and
    sampled distinct strings, so WHERE clauses exercise real
    selectivities instead of always-empty/always-full;
  - no LIMIT without ORDER BY (nondeterministic), no `/` or `%` on
    negatives, LIKE uses % only;
  - ORDER BY under LIMIT always ends in the table's unique key AND
    spells NULLS FIRST/LAST explicitly where NULLs can appear (the
    engines' ASC defaults differ);
  - grouping-set queries (ROLLUP/CUBE/GROUPING SETS) guarantee a
    non-empty input: the empty grouping set over an EMPTY relation is a
    real dialect divergence (DuckDB/Postgres emit the grand-total row
    per the SQL standard, Spark emits nothing — found by the r13
    10-seed campaign, adjudicated in BENCH_NOTES).

Families (gen): single-table aggregates, scalar projections, FK joins
(single-hop inner, two-hop chains, left-outer against a filtered right
side, EXISTS/NOT EXISTS semi/anti), set ops incl. ALL variants,
top-k, window rank, date-trunc, NULL-injection aggregates,
ROLLUP/CUBE/GROUPING SETS with GROUPING() flags, NULLS FIRST/LAST
ordering, explicit ROWS window frames, HAVING over join aggregates,
conditional aggregation (SUM/MIN over CASE), string functions (case
folding/trim/substring/||-concat with a NULL-propagation pin/replace/
reverse/left), timestamp INTERVAL arithmetic + EXTRACT (DOW excluded:
the engines number weekdays differently), correlated scalar aggregate
subqueries (COUNT-on-empty=0, MIN/MAX-on-empty=NULL — probed and
agreed), [NOT] IN subqueries incl. NULLIF-poisoned lists (standard
three-valued logic on both sides), windows OVER join results (FK->PK
edges keep the left pk a total tie-break), grouping-flag level
selection over ROLLUP results (filter-after-expansion; HAVING
GROUPING() itself is a probed Spark resolution asymmetry, excluded),
combined EXISTS + NOT EXISTS over two FK edges of one outer table,
aggregate FILTER clauses
(COUNT/SUM/MIN masks incl. the empty-filter NULL/0 pins), rank
functions over total orders (NTILE remainder rule, PERCENT_RANK/
CUME_DIST exact rationals, shared named WINDOW), pure inequality band
joins on small tables (DuckDB IEJoin vs Spark nested-loop),
multiple DISTINCT
aggregates per SELECT incl. NULLIF-poisoned distincts + SUM(DISTINCT),
correlated EXISTS with aggregate-HAVING subqueries, CASE expressions
as grouping keys (incl. NULL-producing keys and ABS-guarded modulo
buckets), FULL OUTER joins of filtered sides (symmetric null-extension
pinned by the COUNT triple), RANGE window frames over integer orders
(value-distance framing — peer-order-independent where ROWS would be
nondeterministic).

Every run is seeded: the same (seed, n, schema) always generates the
same query texts, and failures print the query name whose .sql file
reproduces the case standalone.
"""
import os
import random
import subprocess
import sys

import duckdb

TABLES = ["lineitem", "orders", "customer", "supplier", "part", "nation",
          "region"]
# unique keys: the total-order tie-breaks that make ORDER BY/LIMIT and
# window ranks engine-deterministic
PK = {"lineitem": ["l_orderkey", "l_linenumber"], "orders": ["o_orderkey"],
      "customer": ["c_custkey"], "supplier": ["s_suppkey"],
      "part": ["p_partkey"], "nation": ["n_nationkey"],
      "region": ["r_regionkey"]}
JOINS = [  # (left table, left key, right table, right key)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
]
# two-hop FK chains (a⋈b⋈c), derived from JOINS where the middle table
# carries the second key — lineitem⋈orders⋈customer etc.
CHAINS = [(lt, lk, rt, rk, lk2, rt2, rk2)
          for (lt, lk, rt, rk) in JOINS
          for (lt2, lk2, rt2, rk2) in JOINS if lt2 == rt]

ADDOPENS = " ".join(
    f"--add-opens java.base/{p}=ALL-UNNAMED" for p in
    ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
     "java.net", "java.nio", "java.util", "java.util.concurrent",
     "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
     "sun.security.action", "sun.util.calendar"])


def schema(con, sf, t):
    cols = con.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{sf}/{t}.parquet')"
    ).fetchall()
    ints = [c for c, ty, *_ in cols if ty in ("BIGINT", "INTEGER")]
    dbls = [c for c, ty, *_ in cols if ty == "DOUBLE"]
    strs = [c for c, ty, *_ in cols if ty == "VARCHAR"]
    tss = [c for c, ty, *_ in cols if ty.startswith("TIMESTAMP")]
    return ints, dbls, strs, tss


def col_stats(con, sf, t, ints, strs):
    rng, samples = {}, {}
    for c in ints:
        lo, hi = con.sql(
            f"SELECT MIN({c}), MAX({c}) FROM read_parquet('{sf}/{t}.parquet')"
        ).fetchone()
        rng[c] = (int(lo), int(hi))
    for c in strs:
        # ORDER BY before LIMIT: without it DuckDB's scan order decides
        # WHICH 12 values are sampled, and the seeded-reproducibility
        # guarantee quietly breaks across duckdb/parquet-layout changes
        vals = [v for (v,) in con.sql(
            f"SELECT DISTINCT {c} FROM read_parquet('{sf}/{t}.parquet') "
            f"ORDER BY {c} LIMIT 12").fetchall()
            if v is not None and v.replace(" ", "").replace("#", "")
                                  .replace("-", "").replace(".", "")
                                  .replace(",", "").isalnum()]
        if vals:
            samples[c] = sorted(vals)[:8]
    return rng, samples


class Gen:
    def __init__(self, con, sf, seed):
        self.r = random.Random(seed)
        self.meta = {}
        for t in TABLES:
            ints, dbls, strs, tss = schema(con, sf, t)
            rng, samples = col_stats(con, sf, t, ints, strs)
            self.meta[t] = dict(ints=ints, dbls=dbls, strs=strs, tss=tss,
                                rng=rng, samples=samples)

    def pred(self, t, alias=""):
        m, r = self.meta[t], self.r
        p = alias + "." if alias else ""
        kinds = []
        if m["ints"]:
            kinds += ["int_cmp", "int_between"]
        if m["samples"]:
            kinds += ["str_in", "str_like"]
        k = r.choice(kinds)
        if k == "int_cmp":
            c = r.choice(m["ints"])
            lo, hi = m["rng"][c]
            v = r.randint(lo, max(lo, hi))
            return f"{p}{c} {r.choice(['<', '<=', '>', '>=', '='])} {v}"
        if k == "int_between":
            c = r.choice(m["ints"])
            lo, hi = m["rng"][c]
            a = r.randint(lo, max(lo, hi)); b = r.randint(lo, max(lo, hi))
            return f"{p}{c} BETWEEN {min(a, b)} AND {max(a, b)}"
        c = r.choice(list(m["samples"]))
        vals = m["samples"][c]
        if k == "str_in":
            picked = r.sample(vals, r.randint(1, min(3, len(vals))))
            lst = ", ".join(f"'{v}'" for v in picked)
            return f"{p}{c} IN ({lst})"
        v = r.choice(vals)
        return f"{p}{c} LIKE '{v[: max(1, len(v) // 2)]}%'"

    def where(self, t, alias=""):
        n = self.r.randint(0, 2)
        if n == 0:
            return ""
        parts = [self.pred(t, alias) for _ in range(n)]
        return " WHERE " + f" {self.r.choice(['AND', 'OR'])} ".join(parts)

    def q_agg(self):
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        g = r.choice(m["strs"] + m["ints"])
        aggs = [f"CAST(COUNT(*) AS BIGINT) AS cnt"]
        if m["ints"]:
            c = r.choice(m["ints"])
            aggs.append(f"CAST(SUM({c}) AS BIGINT) AS s0")
            aggs.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS d0")
        for pool, nm in ((m["dbls"], "m0"), (m["tss"], "m1")):
            if pool:
                c = r.choice(pool)
                aggs.append(f"{r.choice(['MIN', 'MAX'])}({c}) AS {nm}")
        having = ""
        if r.random() < 0.3:
            having = f" HAVING COUNT(*) > {r.randint(0, 3)}"
        return (f"SELECT {g} AS k0, {', '.join(aggs)} FROM {t}"
                f"{self.where(t)} GROUP BY 1{having}")

    def q_scalar(self):
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        cols = []
        if m["ints"]:
            a, b = r.choice(m["ints"]), r.choice(m["ints"])
            cols.append(f"{a} * {r.randint(2, 9)} + {b} AS e0")
            cols.append(
                f"CASE WHEN {a} % {r.randint(2, 7)} = 0 THEN 'even'"
                f" ELSE 'odd' END AS c0")
        if m["strs"]:
            s = r.choice(m["strs"])
            cols.append(f"UPPER({s}) AS u0")
            cols.append(f"CAST(LENGTH({s}) AS BIGINT) AS l0")
        key = r.choice(m["ints"] + m["strs"])
        return (f"SELECT {key} AS k0, {', '.join(cols)} FROM {t}"
                f"{self.where(t)}")

    def q_join(self):
        r = self.r
        lt, lk, rt, rk = r.choice(JOINS)
        g = r.choice(self.meta[rt]["strs"] + self.meta[rt]["ints"])
        w = self.where(lt, "a")
        return (f"SELECT b.{g} AS k0, CAST(COUNT(*) AS BIGINT) AS cnt "
                f"FROM {lt} a JOIN {rt} b ON a.{lk} = b.{rk}{w} "
                f"GROUP BY 1")

    def q_setop(self):
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        c = r.choice(m["ints"] + m["strs"])
        # ALL variants keep duplicates — the family where engines diverge
        # on bag vs set semantics (EXCEPT ALL subtracts per-occurrence)
        op = r.choice(["UNION", "INTERSECT", "EXCEPT",
                       "UNION ALL", "INTERSECT ALL", "EXCEPT ALL"])
        return (f"SELECT {c} AS k0 FROM {t}{self.where(t)} {op} "
                f"SELECT {c} AS k0 FROM {t}{self.where(t)}")

    def q_join_multi(self):
        # two-hop FK chain with aggregation: the TPC-H shape
        # (lineitem⋈orders⋈customer) VERDICT r12 #1 names — join order,
        # duplicate-key fan-out, and group-by over the far table all in
        # one query.
        r = self.r
        lt, lk, rt, rk, lk2, rt2, rk2 = r.choice(CHAINS)
        g = r.choice(self.meta[rt2]["strs"] + self.meta[rt2]["ints"])
        aggs = ["CAST(COUNT(*) AS BIGINT) AS cnt"]
        if self.meta[lt]["ints"]:
            c = r.choice(self.meta[lt]["ints"])
            aggs.append(f"CAST(SUM(a.{c}) AS BIGINT) AS s0")
        w = self.where(lt, "a")
        return (f"SELECT c.{g} AS k0, {', '.join(aggs)} FROM {lt} a "
                f"JOIN {rt} b ON a.{lk} = b.{rk} "
                f"JOIN {rt2} c ON b.{lk2} = c.{rk2}{w} GROUP BY 1")

    def q_join_outer(self):
        # LEFT JOIN against a FILTERED right side: null-extended rows are
        # real (the predicate removes matches), and COUNT(b.key) vs
        # COUNT(*) pins the null-skipping contract on the extended rows.
        r = self.r
        lt, lk, rt, rk = r.choice(JOINS)
        g = r.choice(self.meta[lt]["strs"] + self.meta[lt]["ints"])
        bp = self.pred(rt)
        return (f"SELECT a.{g} AS k0, CAST(COUNT(*) AS BIGINT) AS cnt_star, "
                f"CAST(COUNT(b.{rk}) AS BIGINT) AS cnt_b "
                f"FROM {lt} a LEFT JOIN "
                f"(SELECT * FROM {rt} WHERE {bp}) b ON a.{lk} = b.{rk} "
                f"GROUP BY 1")

    def q_join_semi(self):
        # semi/anti via [NOT] EXISTS — the rewrite both engines plan as
        # LeftSemi/LeftAnti; correlated predicate plus an inner filter.
        r = self.r
        lt, lk, rt, rk = r.choice(JOINS)
        g = r.choice(self.meta[lt]["strs"] + self.meta[lt]["ints"])
        neg = r.choice(["", "NOT "])
        bp = self.pred(rt, "b")
        # parenthesize the random where(): it may contain OR, and a bare
        # "p1 OR p2 AND EXISTS(...)" binds the EXISTS to the last disjunct
        # only — still the same in both engines, but no longer a semi-join
        w = self.where(lt, "a")
        head = (w.replace(" WHERE ", " WHERE (", 1) + ") AND ") if w \
            else " WHERE "
        return (f"SELECT a.{g} AS k0, CAST(COUNT(*) AS BIGINT) AS cnt "
                f"FROM {lt} a{head}{neg}EXISTS "
                f"(SELECT 1 FROM {rt} b WHERE b.{rk} = a.{lk} AND {bp}) "
                f"GROUP BY 1")

    def q_grouping(self):
        # ROLLUP / CUBE / GROUPING SETS over two keys, with GROUPING()
        # flags so subtotal-row NULLs are distinguishable from data NULLs
        # — the multi-grouping family §2.4 certifies one query at a time.
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        pool = m["strs"] + m["ints"]
        k1, k2 = r.sample(pool, 2)
        spec = r.choice([f"ROLLUP({k1}, {k2})", f"CUBE({k1}, {k2})",
                         f"GROUPING SETS (({k1}, {k2}), ({k1}), ())",
                         f"GROUPING SETS (({k1}), ({k2}))"])
        aggs = ["CAST(COUNT(*) AS BIGINT) AS cnt",
                f"CAST(GROUPING({k1}) AS BIGINT) AS g1",
                f"CAST(GROUPING({k2}) AS BIGINT) AS g2"]
        if m["ints"]:
            c = r.choice(m["ints"])
            aggs.append(f"CAST(SUM({c}) AS BIGINT) AS s0")
        # the WHERE must match >=1 row: the empty grouping set over an
        # EMPTY input is a real dialect divergence the 10-seed campaign
        # caught (DuckDB/Postgres emit the grand-total row per the
        # standard; Spark emits nothing — adjudicated in BENCH_NOTES
        # r13), so empty inputs live OUTSIDE the intersection this
        # grammar targets. A BETWEEN anchored at the column's true min
        # always catches the min row while keeping selectivity random.
        ic = r.choice(m["ints"])
        lo, hi = m["rng"][ic]
        w = f" WHERE {ic} BETWEEN {lo} AND {r.randint(lo, max(lo, hi))}" \
            if r.random() < 0.7 else ""
        return (f"SELECT {k1}, {k2}, {', '.join(aggs)} FROM {t}"
                f"{w} GROUP BY {spec}")

    def q_order_nulls(self):
        # explicit NULLS FIRST/LAST with injected NULLs: engine defaults
        # differ (Spark ASC=NULLS FIRST, DuckDB ASC=NULLS LAST), so the
        # explicit forms are exactly what must pin behavior; pk tiebreak
        # keeps LIMIT deterministic.
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        c = r.choice(m["ints"])
        lo, hi = m["rng"][c]
        v = r.randint(lo, max(lo, hi))
        pk = ", ".join(PK[t])
        d = r.choice(["ASC", "DESC"])
        nf = r.choice(["NULLS FIRST", "NULLS LAST"])
        cols = ", ".join(dict.fromkeys(PK[t]))
        return (f"SELECT {cols}, NULLIF({c}, {v}) AS v0 FROM {t}"
                f"{self.where(t)} ORDER BY v0 {d} {nf}, {pk} "
                f"LIMIT {r.randint(1, 20)}")

    def q_topk(self):
        # deterministic ONLY because the ORDER BY ends in the unique key
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        c = r.choice(m["ints"] + m["dbls"])
        pk = ", ".join(PK[t])
        d = r.choice(["ASC", "DESC"])
        cols = ", ".join(dict.fromkeys(PK[t] + [c]))  # pk ∪ value, ordered
        return (f"SELECT {cols} FROM {t}{self.where(t)} "
                f"ORDER BY {c} {d}, {pk} LIMIT {r.randint(1, 20)}")

    def q_window(self):
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        g = r.choice(m["strs"] + m["ints"])
        c = r.choice(m["ints"] + m["dbls"])
        pk = ", ".join(PK[t])
        keep = r.randint(1, 3)
        return (f"SELECT k0, c0, rn FROM ("
                f"SELECT {g} AS k0, {c} AS c0, CAST(ROW_NUMBER() OVER ("
                f"PARTITION BY {g} ORDER BY {c} DESC, {pk}) AS BIGINT) AS rn "
                f"FROM {t}{self.where(t)}) WHERE rn <= {keep}")

    def q_datetime(self):
        r = self.r
        t = r.choice([x for x in TABLES if self.meta[x]["tss"]])
        ts = r.choice(self.meta[t]["tss"])
        unit = r.choice(["day", "week", "month", "year"])
        return (f"SELECT date_trunc('{unit}', {ts}) AS k0, "
                f"CAST(COUNT(*) AS BIGINT) AS cnt, "
                f"MIN({ts}) AS m0 FROM {t}{self.where(t)} GROUP BY 1")

    def q_nulls(self):
        # TPC-H data carries no NULLs, so inject them deterministically
        # (NULLIF against a real value) and fuzz the semantics that
        # diverge most often across engines: NULL-skipping aggregates,
        # COUNT(col) vs COUNT(*), GROUP BY NULL keys, COALESCE.
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        c = r.choice(m["ints"])
        lo, hi = m["rng"][c]
        v = r.randint(lo, max(lo, hi))
        # the group key goes NULL for a real subset of rows, not all
        if m["samples"] and r.random() < 0.7:
            gc = r.choice(list(m["samples"]))
            g = f"NULLIF({gc}, '{r.choice(m['samples'][gc])}')"
        else:
            gc = r.choice(m["ints"])
            glo, ghi = m["rng"][gc]
            g = f"NULLIF({gc}, {r.randint(glo, max(glo, ghi))})"
        return (f"SELECT {g} AS k_null, "
                f"CAST(COUNT(*) AS BIGINT) AS cnt_star, "
                f"CAST(COUNT(NULLIF({c}, {v})) AS BIGINT) AS cnt_col, "
                f"CAST(SUM(NULLIF({c}, {v})) AS BIGINT) AS s0, "
                f"CAST(SUM(COALESCE(NULLIF({c}, {v}), 0)) AS BIGINT) AS s1, "
                f"CAST(COUNT(DISTINCT NULLIF({c}, {v})) AS BIGINT) AS d0 "
                f"FROM {t}{self.where(t)} GROUP BY 1")

    def q_window_frame(self):
        # running/sliding integer sums over an explicit ROWS frame — the
        # total order (ORDER BY value, pk) makes the frame contents, and
        # so the exact integer sum, engine-deterministic
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        g = r.choice(m["strs"] + m["ints"])
        c = r.choice(m["ints"])
        pk = ", ".join(PK[t])
        frame = r.choice(["UNBOUNDED PRECEDING AND CURRENT ROW",
                          f"{r.randint(1, 5)} PRECEDING AND CURRENT ROW",
                          f"1 PRECEDING AND {r.randint(1, 3)} FOLLOWING"])
        cols = ", ".join(dict.fromkeys(PK[t]))
        return (f"SELECT {cols}, CAST(SUM({c}) OVER (PARTITION BY {g} "
                f"ORDER BY {c}, {pk} ROWS BETWEEN {frame}) AS BIGINT) AS w0 "
                f"FROM {t}{self.where(t)}")

    def q_having_join(self):
        # aggregate over a join with a HAVING on the aggregate — the
        # post-aggregation filter path (distinct from WHERE pushdown)
        r = self.r
        lt, lk, rt, rk = r.choice(JOINS)
        g = r.choice(self.meta[rt]["strs"] + self.meta[rt]["ints"])
        c = r.choice(self.meta[lt]["ints"])
        hv = r.choice([f"COUNT(*) > {r.randint(1, 5)}",
                       f"CAST(SUM(a.{c}) AS BIGINT) > {r.randint(10, 10000)}",
                       f"COUNT(DISTINCT a.{c}) >= {r.randint(1, 3)}"])
        return (f"SELECT b.{g} AS k0, CAST(COUNT(*) AS BIGINT) AS cnt, "
                f"CAST(SUM(a.{c}) AS BIGINT) AS s0 "
                f"FROM {lt} a JOIN {rt} b ON a.{lk} = b.{rk} "
                f"GROUP BY 1 HAVING {hv}")

    def q_cond_agg(self):
        # conditional aggregation: SUM(CASE ...), FILTER-less portable
        # form — integer-exact, exercises predicate evaluation inside the
        # aggregate buffer on both engines
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        g = r.choice(m["strs"] + m["ints"])
        c = r.choice(m["ints"])
        p1 = self.pred(t)
        p2 = self.pred(t)
        return (f"SELECT {g} AS k0, "
                f"CAST(SUM(CASE WHEN {p1} THEN 1 ELSE 0 END) AS BIGINT) AS c1, "
                f"CAST(SUM(CASE WHEN {p2} THEN {c} ELSE 0 END) AS BIGINT) AS s1, "
                f"CAST(MIN(CASE WHEN {p1} THEN {c} END) AS BIGINT) AS m1 "
                f"FROM {t} GROUP BY 1")

    def q_string(self):
        # string-function family inside the intersection: case folding,
        # trim, positive-index substring, || concat (both engines
        # NULL-propagate the operator — pinned via NULLIF injection),
        # replace, reverse, left. Positions are 1-based positive on both.
        r = self.r
        t = r.choice([x for x in TABLES if self.meta[x]["strs"]])
        m = self.meta[t]
        s1 = r.choice(m["strs"])
        s2 = r.choice(m["strs"])
        pk = ", ".join(dict.fromkeys(PK[t]))
        i0, n0 = r.randint(1, 4), r.randint(1, 8)
        cols = [f"UPPER({s1}) AS u0", f"LOWER({s2}) AS l0",
                f"TRIM({s1}) AS t0",
                f"SUBSTRING({s1}, {i0}, {n0}) AS sub0",
                f"{s1} || '#' || {s2} AS cat0",
                f"REPLACE({s1}, '{r.choice('aeiou')}', '_') AS rep0",
                f"REVERSE({s2}) AS rev0",
                f"LEFT({s1}, {r.randint(1, 6)}) AS lf0",
                f"CAST(LENGTH({s1} || {s2}) AS BIGINT) AS len0"]
        if m["samples"].get(s1):
            v = r.choice(m["samples"][s1])
            # the || NULL-propagation pin: one side NULLIF'd on a real value
            cols.append(f"NULLIF({s1}, '{v}') || '+' AS np0")
        return f"SELECT {pk}, {', '.join(cols)} FROM {t}{self.where(t)}"

    def q_datemath(self):
        # timestamp arithmetic: +/- INTERVAL (same grammar both engines),
        # EXTRACT of YEAR/MONTH/DAY/HOUR (cast — return types differ),
        # and min/max of shifted timestamps. DOW is deliberately out:
        # the engines number weekdays differently.
        r = self.r
        t = r.choice([x for x in TABLES if self.meta[x]["tss"]])
        m = self.meta[t]
        ts = r.choice(m["tss"])
        g = r.choice(m["strs"] + m["ints"])
        k = r.randint(1, 30)
        unit = r.choice(["DAY", "HOUR", "MINUTE"])
        fld = r.choice(["YEAR", "MONTH", "DAY", "HOUR"])
        return (f"SELECT {g} AS k0, "
                f"CAST(COUNT(*) AS BIGINT) AS cnt, "
                f"MIN({ts} + INTERVAL {k} {unit}) AS m0, "
                f"MAX({ts} - INTERVAL {k} {unit}) AS m1, "
                f"CAST(MIN(EXTRACT({fld} FROM {ts})) AS BIGINT) AS e0 "
                f"FROM {t}{self.where(t)} GROUP BY 1")

    def q_scalar_subq(self):
        # correlated scalar aggregate subquery, iterated from the PK side
        # of a FK edge so the inner relation fans out: COUNT-on-empty = 0
        # and MIN/MAX-on-empty = NULL are the probed-and-agreed semantics
        r = self.r
        lt, lk, rt, rk = r.choice(JOINS)
        c = r.choice(self.meta[lt]["ints"])
        agg = r.choice([f"COUNT(*)", f"MAX(b.{c})", f"MIN(b.{c})"])
        bp = self.pred(lt, "b")
        pk = ", ".join(dict.fromkeys(PK[rt]))
        return (f"SELECT {pk}, CAST((SELECT {agg} FROM {lt} b "
                f"WHERE b.{lk} = a.{rk} AND {bp}) AS BIGINT) AS sq0 "
                f"FROM {rt} a{self.where(rt, 'a')}")

    def q_in_subq(self):
        # [NOT] IN over a filtered subquery, optionally NULLIF-poisoned:
        # NOT IN against a list containing NULL selects NOTHING under
        # standard three-valued logic — both engines follow it (probed)
        r = self.r
        lt, lk, rt, rk = r.choice(JOINS)
        g = r.choice(self.meta[lt]["strs"] + self.meta[lt]["ints"])
        neg = r.choice(["", "NOT "])
        bp = self.pred(rt)
        inner = f"SELECT {rk} FROM {rt} WHERE {bp}"
        if r.random() < 0.3:
            lo, hi = self.meta[rt]["rng"][rk]
            inner = (f"SELECT NULLIF({rk}, {r.randint(lo, max(lo, hi))}) "
                     f"FROM {rt} WHERE {bp}")
        return (f"SELECT a.{g} AS k0, CAST(COUNT(*) AS BIGINT) AS cnt "
                f"FROM {lt} a WHERE a.{lk} {neg}IN ({inner}) GROUP BY 1")

    def q_window_join(self):
        # window functions OVER a join result — rank partitioned by a
        # RIGHT-table attribute over the joined relation. Deterministic:
        # every JOINS edge is FK->PK (the right side is unique on rk), so
        # joined rows stay 1:1 with left rows and the left pk remains a
        # total tie-break; RANK/DENSE_RANK therefore equal ROW_NUMBER and
        # stay cross-engine exact.
        r = self.r
        lt, lk, rt, rk = r.choice(JOINS)
        g = r.choice(self.meta[rt]["strs"] + self.meta[rt]["ints"])
        c = r.choice(self.meta[lt]["ints"])
        pk = ", ".join(f"a.{k}" for k in PK[lt])
        fn = r.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
        keep = r.randint(1, 4)
        w = self.where(lt, "a")
        return (f"SELECT k0, c0, rn FROM ("
                f"SELECT b.{g} AS k0, a.{c} AS c0, CAST({fn} OVER ("
                f"PARTITION BY b.{g} ORDER BY a.{c} DESC, {pk}) AS BIGINT)"
                f" AS rn FROM {lt} a JOIN {rt} b ON a.{lk} = b.{rk}{w}) "
                f"WHERE rn <= {keep}")

    def q_distinct_agg(self):
        # multiple DISTINCT aggregates in one SELECT (Spark plans these
        # through Expand) plus a NULLIF-poisoned distinct — NULLs must be
        # skipped by COUNT(DISTINCT) on both engines — and SUM(DISTINCT).
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        g = r.choice(m["strs"] + m["ints"])
        c1, c2 = r.choice(m["ints"]), r.choice(m["ints"])
        lo, hi = m["rng"][c1]
        v = r.randint(lo, max(lo, hi))
        cols = [f"CAST(COUNT(DISTINCT {c1}) AS BIGINT) AS d1",
                f"CAST(COUNT(DISTINCT {c2}) AS BIGINT) AS d2",
                f"CAST(COUNT(DISTINCT NULLIF({c1}, {v})) AS BIGINT) AS dn",
                f"CAST(SUM(DISTINCT {c1}) AS BIGINT) AS sd1",
                "CAST(COUNT(*) AS BIGINT) AS cnt"]
        if m["strs"]:
            cols.append(f"CAST(COUNT(DISTINCT {r.choice(m['strs'])}) "
                        f"AS BIGINT) AS d3")
        return (f"SELECT {g} AS k0, {', '.join(cols)} FROM {t}"
                f"{self.where(t)} GROUP BY 1")

    def q_exists_agg(self):
        # correlated EXISTS whose subquery is an AGGREGATE with HAVING —
        # existence decided by a group property (count/max over the
        # correlated fan-out), not by row presence; iterated from the PK
        # side so the inner relation genuinely fans out.
        r = self.r
        lt, lk, rt, rk = r.choice(JOINS)
        g = r.choice(self.meta[rt]["strs"] + self.meta[rt]["ints"])
        neg = r.choice(["", "NOT "])
        c = r.choice(self.meta[lt]["ints"])
        lo, hi = self.meta[lt]["rng"][c]
        hv = r.choice([f"COUNT(*) > {r.randint(1, 6)}",
                       f"COUNT(*) = {r.randint(1, 4)}",
                       f"MAX(b.{c}) >= {r.randint(lo, max(lo, hi))}"])
        bp = self.pred(lt, "b")
        return (f"SELECT a.{g} AS k0, CAST(COUNT(*) AS BIGINT) AS cnt "
                f"FROM {rt} a WHERE {neg}EXISTS "
                f"(SELECT COUNT(*) FROM {lt} b WHERE b.{lk} = a.{rk} "
                f"AND {bp} HAVING {hv}) GROUP BY 1")

    def q_case_groupby(self):
        # CASE expressions AS the grouping keys (plus a modulo bucket):
        # the grouping key is computed, so key equality/NULL handling in
        # the hash-agg path is exercised on derived values, not columns.
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        c = r.choice(m["ints"])
        lo, hi = m["rng"][c]
        v1, v2 = (r.randint(lo, max(lo, hi)) for _ in range(2))
        lo2, hi2 = min(v1, v2), max(v1, v2)
        k1 = (f"CASE WHEN {c} < {lo2} THEN 'low' "
              f"WHEN {c} <= {hi2} THEN 'mid' ELSE 'high' END")
        # modulo bucket key — ABS keeps the no-%-on-negatives rule
        c2 = r.choice(m["ints"])
        k2 = f"CAST(ABS({c2}) % {r.randint(2, 5)} AS BIGINT)"
        keys = [f"{k1} AS k0", f"{k2} AS k1"]
        if r.random() < 0.4:
            # a NULL-producing CASE key: rows outside the band group as
            # the NULL key on both engines
            keys.append(
                f"CASE WHEN {c} BETWEEN {lo2} AND {hi2} THEN 'in' END AS k2")
        aggs = ["CAST(COUNT(*) AS BIGINT) AS cnt",
                f"CAST(SUM({c}) AS BIGINT) AS s0"]
        gb = ", ".join(str(i + 1) for i in range(len(keys)))
        return (f"SELECT {', '.join(keys + aggs)} FROM {t}{self.where(t)} "
                f"GROUP BY {gb}")

    def q_join_full(self):
        # FULL OUTER JOIN of two FILTERED sides: null-extension happens
        # on BOTH sides, and the COUNT(*) / COUNT(a.k) / COUNT(b.k)
        # triple pins the null-skipping contract symmetrically. The
        # summed COALESCE key folds both extension directions into one
        # integer-exact figure.
        r = self.r
        lt, lk, rt, rk = r.choice(JOINS)
        ap = self.pred(lt)
        bp = self.pred(rt)
        return (f"SELECT CAST(COUNT(*) AS BIGINT) AS cnt, "
                f"CAST(COUNT(a.{lk}) AS BIGINT) AS ca, "
                f"CAST(COUNT(b.{rk}) AS BIGINT) AS cb, "
                f"CAST(SUM(COALESCE(a.{lk}, b.{rk}, 0)) AS BIGINT) AS s0 "
                f"FROM (SELECT * FROM {lt} WHERE {ap}) a "
                f"FULL JOIN (SELECT * FROM {rt} WHERE {bp}) b "
                f"ON a.{lk} = b.{rk}")

    def q_window_range(self):
        # RANGE frames over an INTEGER order: frame membership is decided
        # by value distance, so it is peer-order-independent and the
        # integer SUM/COUNT stay engine-exact even with duplicate order
        # values (where a ROWS frame would be nondeterministic).
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        g = r.choice(m["strs"] + m["ints"])
        c = r.choice(m["ints"])
        lo, hi = m["rng"][c]
        k = r.randint(1, max(2, (hi - lo) // 4 or 2))
        pk = ", ".join(dict.fromkeys(PK[t]))
        frame = r.choice([f"{k} PRECEDING AND CURRENT ROW",
                          f"CURRENT ROW AND {k} FOLLOWING",
                          f"{k} PRECEDING AND {k} FOLLOWING"])
        return (f"SELECT {pk}, CAST(SUM({c}) OVER (PARTITION BY {g} "
                f"ORDER BY {c} RANGE BETWEEN {frame}) AS BIGINT) AS w0, "
                f"CAST(COUNT(*) OVER (PARTITION BY {g} ORDER BY {c} "
                f"RANGE BETWEEN {frame}) AS BIGINT) AS w1 "
                f"FROM {t}{self.where(t)}")

    def q_lateral(self):
        # correlated LATERAL subquery in the FROM clause (both engines
        # parse `, LATERAL (SELECT ...)`): per outer row, an aggregate
        # over the FK fan-out — the decorrelation path distinct from
        # scalar subqueries in SELECT (q_scalar_subq). COUNT-on-empty = 0
        # keeps every outer row present on both sides.
        r = self.r
        lt, lk, rt, rk = r.choice(JOINS)
        c = r.choice(self.meta[lt]["ints"])
        bp = self.pred(lt, "b")
        pk = ", ".join(f"a.{k}" for k in PK[rt])
        return (f"SELECT {pk}, CAST(l.cnt AS BIGINT) AS lc0, "
                f"CAST(l.s0 AS BIGINT) AS ls0 "
                f"FROM {rt} a, LATERAL (SELECT COUNT(*) AS cnt, "
                f"COALESCE(SUM(CASE WHEN {bp} THEN b.{c} ELSE 0 END), 0) "
                f"AS s0 FROM {lt} b WHERE b.{lk} = a.{rk}) l"
                f"{self.where(rt, 'a')}")

    def q_decimal(self):
        # DECIMAL casts + exact arithmetic: integer columns cast to
        # DECIMAL(18,3), scaled by integer constants, summed — decimal
        # sums are exact on both engines, unlike double sums (the rule
        # that keeps SUM out of the dbls pool). Result precision is
        # pinned by an explicit outer CAST because the engines' implicit
        # sum-precision widening rules differ (Spark +10 digits, DuckDB
        # to DECIMAL(38)); division stays out — quotient scale rules
        # genuinely diverge.
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        g = r.choice(m["strs"] + m["ints"])
        c1, c2 = r.choice(m["ints"]), r.choice(m["ints"])
        k = r.randint(2, 9)
        return (f"SELECT {g} AS k0, "
                f"CAST(SUM(CAST({c1} AS DECIMAL(18,3))) AS DECIMAL(28,3)) "
                f"AS s0, "
                f"CAST(SUM(CAST({c1} AS DECIMAL(18,3)) * {k}) "
                f"AS DECIMAL(28,3)) AS s1, "
                f"CAST(MIN(CAST({c2} AS DECIMAL(18,3)) - "
                f"CAST({c1} AS DECIMAL(18,3))) AS DECIMAL(28,3)) AS m0, "
                f"CAST(COUNT(*) AS BIGINT) AS cnt "
                f"FROM {t}{self.where(t)} GROUP BY 1")

    def q_setop_window(self):
        # window over a set-op result: ROW_NUMBER over UNION ALL of two
        # filtered slices of the same table. A side tag joins the pk in
        # the ORDER BY so the union's total order (and therefore the
        # rank) stays engine-deterministic even where the slices overlap.
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        c = r.choice(m["ints"])
        pk = ", ".join(PK[t])
        cols = ", ".join(dict.fromkeys(PK[t] + [c]))
        p1, p2 = self.pred(t), self.pred(t)
        keep = r.randint(2, 12)
        return (f"SELECT side, {cols}, rn FROM ("
                f"SELECT u.*, CAST(ROW_NUMBER() OVER (ORDER BY {c} DESC, "
                f"{pk}, side) AS BIGINT) AS rn FROM ("
                f"SELECT 'a' AS side, {cols} FROM {t} WHERE {p1} "
                f"UNION ALL "
                f"SELECT 'b' AS side, {cols} FROM {t} WHERE {p2}) u) "
                f"WHERE rn <= {keep}")

    def q_cte(self):
        # chained CTEs with one CTE referenced TWICE (a filtered base
        # feeding both a per-key aggregate and the row side of the join
        # back) — the reuse/inlining decision differs across engines but
        # the result must not.
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        g = r.choice(m["strs"] + m["ints"])
        c = r.choice(m["ints"])
        w = self.where(t) or " WHERE 1 = 1"
        return (f"WITH f AS (SELECT * FROM {t}{w}), "
                f"g AS (SELECT {g} AS k0, CAST(COUNT(*) AS BIGINT) AS cnt, "
                f"CAST(SUM({c}) AS BIGINT) AS s0 FROM f GROUP BY 1) "
                f"SELECT g.k0, g.cnt, g.s0, "
                f"CAST(COUNT(*) AS BIGINT) AS cnt2 "
                f"FROM g JOIN f ON f.{g} = g.k0 "
                f"GROUP BY 1, 2, 3")

    def q_agg_filter(self):
        # FILTER clauses on aggregates: both engines implement the
        # standard `agg(...) FILTER (WHERE p)` — semantically the
        # SUM(CASE...) of q_cond_agg but a distinct parse/plan path
        # (Spark rewrites the predicate into the agg expression, DuckDB
        # keeps a filter mask). COUNT-on-empty-filter = 0 and
        # SUM/MIN-on-empty-filter = NULL are both pinned.
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        g = r.choice(m["strs"] + m["ints"])
        c = r.choice(m["ints"])
        p1, p2 = self.pred(t), self.pred(t)
        return (f"SELECT {g} AS k0, "
                f"CAST(COUNT(*) FILTER (WHERE {p1}) AS BIGINT) AS f0, "
                f"CAST(SUM({c}) FILTER (WHERE {p2}) AS BIGINT) AS f1, "
                f"CAST(MIN({c}) FILTER (WHERE {p1}) AS BIGINT) AS f2, "
                f"CAST(COUNT(*) AS BIGINT) AS cnt "
                f"FROM {t}{self.where(t)} GROUP BY 1")

    def q_rankfuncs(self):
        # rank-function family over a TOTAL order (pk tie-break):
        # NTILE bucket boundaries follow the standard remainder rule and
        # PERCENT_RANK/CUME_DIST are exact small rationals — identical
        # doubles on both engines once the order is total. A named
        # WINDOW clause shares one definition across all four functions.
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        g = r.choice(m["strs"] + m["ints"])
        c = r.choice(m["ints"])
        pk = ", ".join(PK[t])
        n = r.randint(2, 7)
        keep = r.randint(2, 10)
        return (f"SELECT * FROM (SELECT {pk}, "
                f"CAST(NTILE({n}) OVER w AS BIGINT) AS r0, "
                f"PERCENT_RANK() OVER w AS r1, "
                f"CUME_DIST() OVER w AS r2, "
                f"CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn "
                f"FROM {t}{self.where(t)} "
                f"WINDOW w AS (PARTITION BY {g} ORDER BY {c}, {pk})) "
                f"WHERE rn <= {keep}")

    def q_range_join(self):
        # pure inequality (band) join: DuckDB plans an IEJoin, Spark a
        # nested-loop — maximally different physical algorithms that
        # must agree. Small tables only (the band fan-out is quadratic
        # in principle), aggregated per left pk so output stays bounded
        # and the inner join drops empty groups identically on both
        # sides.
        r = self.r
        small = ["nation", "region", "supplier"]
        t1, t2 = r.sample(small, 2)
        m1, m2 = self.meta[t1], self.meta[t2]
        c1, c2 = r.choice(m1["ints"]), r.choice(m2["ints"])
        k = r.randint(1, 6)
        pk = ", ".join(f"a.{p}" for p in PK[t1])
        return (f"SELECT {pk}, CAST(COUNT(*) AS BIGINT) AS cnt, "
                f"CAST(SUM(b.{c2}) AS BIGINT) AS s0, "
                f"CAST(MIN(b.{c2}) AS BIGINT) AS m0 "
                f"FROM {t1} a JOIN {t2} b "
                f"ON b.{c2} BETWEEN a.{c1} - {k} AND a.{c1} + {k} "
                f"GROUP BY 1")

    def q_grouping_having(self):
        # level selection AFTER the grouping-set expansion: filter the
        # rollup on its GROUPING() flags (subtotal-only, detail-only, a
        # flag sum) — a filter position q_grouping never exercises. The
        # filter rides an outer query over the projected flags rather
        # than HAVING GROUPING(...): Spark cannot resolve GROUPING() in
        # HAVING once the grouped columns are aliased in SELECT (probed;
        # resolution asymmetry, outside the intersection), while the
        # flag-column filter is identical algebra on both engines.
        # WHERE guarantees non-empty input (the empty-input grand-total
        # row is the known excluded dialect divergence).
        r = self.r
        t = r.choice(TABLES)
        m = self.meta[t]
        pool = m["strs"] + m["ints"]
        g1 = r.choice(pool)
        g2 = r.choice([c for c in pool if c != g1] or [g1])
        c = r.choice(m["ints"])
        keep = r.choice(["gf0 = 0", "gf1 = 1", "gf0 + gf1 <= 1"])
        w = self.where(t) or " WHERE 1 = 1"
        return (f"SELECT * FROM ("
                f"SELECT {g1} AS k0, {g2} AS k1, "
                f"CAST(GROUPING({g1}) AS BIGINT) AS gf0, "
                f"CAST(GROUPING({g2}) AS BIGINT) AS gf1, "
                f"CAST(SUM({c}) AS BIGINT) AS s0, "
                f"CAST(COUNT(*) AS BIGINT) AS cnt "
                f"FROM {t}{w} GROUP BY ROLLUP({g1}, {g2})) "
                f"WHERE {keep}")

    def q_exists_chain(self):
        # EXISTS and NOT EXISTS combined over TWO different FK edges of
        # the same outer table — the decorrelation must plan a semi AND
        # an anti join against one row stream without letting either
        # filter leak into the other.
        r = self.r
        edges = [(lt, lk, rk) for (lt, lk, rt2, rk) in JOINS]
        outer = r.choice([rt for (_, _, rt, _) in JOINS])
        ins = [(lt, lk, rk) for (lt, lk, rt2, rk) in JOINS if rt2 == outer]
        if len(ins) < 1:
            return self.q_join_semi()
        e1 = r.choice(ins)
        e2 = r.choice(ins)
        p1 = self.pred(e1[0], "b")
        p2 = self.pred(e2[0], "c")
        pk = ", ".join(f"a.{k}" for k in PK[outer])
        return (f"SELECT {pk} FROM {outer} a "
                f"WHERE EXISTS (SELECT 1 FROM {e1[0]} b "
                f"WHERE b.{e1[1]} = a.{e1[2]} AND {p1}) "
                f"AND NOT EXISTS (SELECT 1 FROM {e2[0]} c "
                f"WHERE c.{e2[1]} = a.{e2[2]} AND {p2}) "
                f"ORDER BY {pk}")

    def gen(self, i):
        return [self.q_agg, self.q_scalar, self.q_join, self.q_setop,
                self.q_topk, self.q_window, self.q_datetime,
                self.q_nulls, self.q_join_multi, self.q_join_outer,
                self.q_join_semi, self.q_grouping, self.q_order_nulls,
                self.q_window_frame, self.q_having_join,
                self.q_cond_agg, self.q_string, self.q_datemath,
                self.q_scalar_subq, self.q_in_subq, self.q_window_join,
                self.q_distinct_agg, self.q_exists_agg,
                self.q_case_groupby, self.q_join_full,
                self.q_window_range, self.q_lateral, self.q_decimal,
                self.q_setop_window, self.q_cte, self.q_agg_filter,
                self.q_rankfuncs, self.q_range_join,
                self.q_grouping_having, self.q_exists_chain][i % 35]()


def main():
    # positionals are the argv entries that aren't a flag or its value
    flags = {"--n", "--seed"}
    pos, skip = [], False
    for a in sys.argv[1:]:
        if skip:
            skip = False
        elif a in flags:
            skip = True
        else:
            pos.append(a)
    sf = pos[0] if len(pos) > 0 else "/root/testdata/sf0.001"
    out = pos[1] if len(pos) > 1 else "/tmp/fuzz_out"
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 40
    seed = (int(sys.argv[sys.argv.index("--seed") + 1])
            if "--seed" in sys.argv else 42)
    con = duckdb.connect()
    gen = Gen(con, sf, seed)
    # keep the .sql files OUTSIDE the compare dir: check.py treats every
    # subdirectory of `out` as a Spark result to adjudicate. Both dirs
    # start CLEAN — FuzzSql writes parquet only on success, so a stale
    # result from a previous seed/grammar would otherwise be silently
    # adjudicated against this run's regenerated oracle SQL.
    import shutil
    sql_dir = f"{out}_sql"
    for d in (sql_dir, out):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    queries = {f"fuzz_{i:03d}": gen.gen(i) for i in range(n)}
    for name, q in queries.items():
        with open(f"{sql_dir}/{name}.sql", "w") as f:
            f.write(q)
    # oracle_sql.json: the SAME text DuckDB will run (check.py's layout)
    import json
    with open(f"{out}/oracle_sql.json", "w") as f:
        json.dump(queries, f, indent=1)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # newest by mtime, never the tests jar — same rule as round_gate.sh
    tdir = f"{repo}/target/scala-2.13"
    jars = sorted(
        (j for j in os.listdir(tdir)
         if j.endswith(".jar") and not j.endswith("-tests.jar")),
        key=lambda j: os.path.getmtime(f"{tdir}/{j}"))
    if not jars:
        print("difffuzz: no jar — run `sbt package` first"); return 1
    cp = f"{tdir}/{jars[-1]}:/opt/spark/jars/*"
    rc = subprocess.run(
        f"java {ADDOPENS} -Xmx8g -Dspark.ui.enabled=false "
        f"-Dspark.sql.session.timeZone=UTC -cp '{cp}' "
        f"graft.FuzzSql {sf} {sql_dir} {out}",
        shell=True, capture_output=True, text=True)
    for ln in rc.stderr.splitlines():
        if ln.startswith("[fuzz]"):
            print(ln)
    if rc.returncode != 0:
        print(rc.stderr[-2000:]); return 1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import check
    print(f"difffuzz: seed={seed} n={n} sf={sf}")
    return check.main(sf, out)


if __name__ == "__main__":
    sys.exit(main())
