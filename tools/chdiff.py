#!/usr/bin/env python3
"""Differential replay of the parametric-aggregate catalog against a LIVE
ClickHouse — the executable form of the strict_dedup disposition
(ADVICE r16/r17: "any future environment with a reachable ClickHouse
should add the differential").

Usage:
    GRAFT_CLICKHOUSE_URL=http://host:8123 python3 tools/chdiff.py \
        <sfDir> [workDir]

With GRAFT_CLICKHOUSE_URL unset the script prints SKIP and exits 0 —
this environment has no egress and no ClickHouse, so the harness ships
as a scaffold: the per-key ClickHouse SQL below is the best-effort
transcription of each catalog key's semantics onto CH 22.3's own
functions (windowFunnel / retention / sequenceMatch / sequenceCount /
sequenceNextNode) and has NOT run against a live server yet; expect to
debug dialect details on first contact.

What it does when a server IS reachable:
  1. runs `graft.Verify <sfDir> <work>/spark <keys>` for the keys below
     (the engine's own results, exactly what the DuckDB gate compares);
  2. uploads <sfDir>/events.parquet into a throwaway MergeTree table;
  3. runs each key's ClickHouse SQL and value-compares against the
     engine result (column-name sort + row sort, the check.py shape).

Reading the report:
  - `expect=equal` keys should match bit-for-bit given tie-free data.
  - `expect=divergence` marks the DOCUMENTED deltas (standalone
    strict_dedup keeps this engine's last-of-type reading; CH's
    repeat-interrupt rule ships in the combined mode) — a MATCH there
    would actually be news.
  - tie caveat: this engine pins same-timestamp order with the
    (ts, event_id) total order; CH leaves it engine-private. On a
    fixture with tied timestamps a diff on a tie-heavy key is suspect,
    not conclusive — re-run on tie-free data before calling it real.

Timestamps ride as UInt64 microseconds (toUnixTimestamp64Micro) so
windows and (?t) bounds keep the engines' microsecond resolution; the
bounds in the SQL below are therefore in MICROSECONDS where the CH docs
write seconds.
"""
import io
import json
import os
import subprocess
import sys
import urllib.request

TABLE = "graft_diff_events"

# key -> (clickhouse sql, expect) where expect in {"equal", "divergence"}
CH_QUERIES = {
    # windowFunnel: default, strict_order, strict_deduplication, combined
    "o_a15f_funnel_sql": (f"""
        SELECT funnel_level, count() AS n_users FROM (
          SELECT user_id,
                 windowFunnel(43200000000)(toUnixTimestamp64Micro(ts),
                   event_type = 'signup', event_type = 'click',
                   event_type = 'purchase') AS funnel_level
          FROM {TABLE} GROUP BY user_id)
        WHERE funnel_level >= 1
        GROUP BY funnel_level ORDER BY funnel_level
        """, "equal"),
    "o_a15g_funnel_sql_strict": (f"""
        SELECT funnel_level, count() AS n_users FROM (
          SELECT user_id,
                 windowFunnel(43200000000, 'strict_order')(
                   toUnixTimestamp64Micro(ts),
                   event_type = 'signup', event_type = 'click',
                   event_type = 'purchase') AS funnel_level
          FROM {TABLE} GROUP BY user_id)
        WHERE funnel_level >= 1
        GROUP BY funnel_level ORDER BY funnel_level
        """, "equal"),
    # DOCUMENTED divergence: the engine's standalone strict_dedup is the
    # last-of-type reading (WindowFunnel.scala docstring); CH interrupts
    # on a repeated matched condition. signup,click,click,purchase reads
    # level 3 in the engine, 2 in CH.
    "o_a15h_funnel_sql_dedup": (f"""
        SELECT funnel_level, count() AS n_users FROM (
          SELECT user_id,
                 windowFunnel(43200000000, 'strict_deduplication')(
                   toUnixTimestamp64Micro(ts),
                   event_type = 'signup', event_type = 'click',
                   event_type = 'purchase') AS funnel_level
          FROM {TABLE}
          WHERE event_type IN ('signup', 'click', 'purchase')
          GROUP BY user_id)
        WHERE funnel_level >= 1
        GROUP BY funnel_level ORDER BY funnel_level
        """, "divergence"),
    # the combined mode IS CH's interrupt rule — should agree
    "o_a15i_funnel_sql_combined": (f"""
        SELECT funnel_level, count() AS n_users FROM (
          SELECT user_id,
                 windowFunnel(43200000000, 'strict_order',
                              'strict_deduplication')(
                   toUnixTimestamp64Micro(ts),
                   event_type = 'signup', event_type = 'click',
                   event_type IN ('click', 'purchase')) AS funnel_level
          FROM {TABLE} GROUP BY user_id)
        WHERE funnel_level >= 1
        GROUP BY funnel_level ORDER BY funnel_level
        """, "equal"),
    # retention over the first-signup cohort
    "o_a16b_retention_sql": (f"""
        WITH t0s AS (SELECT user_id, min(ts) AS t0 FROM {TABLE}
                     WHERE event_type = 'signup' GROUP BY user_id)
        SELECT toDate(t0) AS cohort_date, count() AS n_users,
               sum(r[2]) AS n_clicked, sum(r[3]) AS n_purchased
        FROM (SELECT e.user_id AS user_id, any(t.t0) AS t0,
                     retention(event_type = 'signup' AND ts = t.t0,
                       event_type = 'click' AND ts > t.t0
                         AND ts <= t.t0 + INTERVAL 3 DAY,
                       event_type = 'purchase' AND ts > t.t0
                         AND ts <= t.t0 + INTERVAL 7 DAY) AS r
              FROM {TABLE} e INNER JOIN t0s t ON e.user_id = t.user_id
              GROUP BY e.user_id)
        GROUP BY cohort_date ORDER BY cohort_date
        """, "equal"),
    # the full CH pattern grammar ((?t) bounds in µs to match the UInt64
    # timestamp column)
    "o_a17c_seqmatch_gaps": (f"""
        SELECT matched, count() AS n_users FROM (
          SELECT user_id,
                 toInt32(sequenceMatch(
                   '(?1)(?t<=43200000000)(?2)(?t>600000000)(?3)')(
                   toUnixTimestamp64Micro(ts),
                   event_type = 'signup', event_type = 'click',
                   event_type = 'purchase')) AS matched,
                 max(event_type = 'signup') AS _h
          FROM {TABLE}
          WHERE event_type IN ('signup', 'click', 'purchase')
          GROUP BY user_id)
        WHERE _h = 1
        GROUP BY matched ORDER BY matched
        """, "equal"),
    # sequenceCount: greedy non-overlapping pairs, unbounded and 12h
    "o_a18d_seqcount_sql": (f"""
        SELECT seq_count, count() AS n_users FROM (
          SELECT user_id,
                 sequenceCount('(?1).*(?2)')(toUnixTimestamp64Micro(ts),
                   event_type = 'signup', event_type = 'purchase')
                   AS seq_count
          FROM {TABLE}
          WHERE event_type IN ('signup', 'purchase') GROUP BY user_id)
        GROUP BY seq_count ORDER BY seq_count
        """, "equal"),
    "o_a18e_seqcount_sql_windowed": (f"""
        SELECT seq_count, count() AS n_users FROM (
          SELECT user_id,
                 sequenceCount('(?1)(?t<=43200000000)(?2)')(
                   toUnixTimestamp64Micro(ts),
                   event_type = 'signup', event_type = 'purchase')
                   AS seq_count
          FROM {TABLE}
          WHERE event_type IN ('signup', 'purchase') GROUP BY user_id)
        GROUP BY seq_count ORDER BY seq_count
        """, "equal"),
    # sequenceNextNode: the direction x base surface + base_condition
    # (CH's base_condition slot is mandatory; 1 = ungated)
    "o_a21b_seq_next_node_sql": (f"""
        SELECT next_node, count() AS n_users FROM (
          SELECT user_id,
                 sequenceNextNode('forward', 'first_match')(
                   ts, event_type, 1,
                   event_type = 'signup', event_type = 'click')
                   AS next_node
          FROM {TABLE} GROUP BY user_id)
        WHERE next_node IS NOT NULL
        GROUP BY next_node ORDER BY next_node
        """, "equal"),
    "o_a21c_seq_next_node_backward": (f"""
        SELECT prev_node, count() AS n_users FROM (
          SELECT user_id,
                 sequenceNextNode('backward', 'first_match')(
                   ts, event_type, 1,
                   event_type = 'purchase', event_type = 'click')
                   AS prev_node
          FROM {TABLE} GROUP BY user_id)
        WHERE prev_node IS NOT NULL
        GROUP BY prev_node ORDER BY prev_node
        """, "equal"),
    "o_a21d_seq_next_node_head": (f"""
        SELECT next_node, count() AS n_users FROM (
          SELECT user_id,
                 sequenceNextNode('forward', 'head')(
                   ts, event_type, 1, event_type = 'signup') AS next_node
          FROM {TABLE} GROUP BY user_id)
        WHERE next_node IS NOT NULL
        GROUP BY next_node ORDER BY next_node
        """, "equal"),
    "o_a21e_seq_next_node_base": (f"""
        SELECT next_node, count() AS n_users FROM (
          SELECT user_id,
                 sequenceNextNode('forward', 'first_match')(
                   ts, event_type, value > 50,
                   event_type = 'signup', event_type = 'click')
                   AS next_node
          FROM {TABLE} GROUP BY user_id)
        WHERE next_node IS NOT NULL
        GROUP BY next_node ORDER BY next_node
        """, "equal"),
}

# engine output column whose CH twin differs in NULL handling: the
# engine's 'NONE' marker for traversal-end is a string, CH returns the
# same — no mapping needed; listed here for future dialect patches
RESULT_PATCHES = {}

ADDOPENS = " ".join(
    f"--add-opens java.base/{p}=ALL-UNNAMED" for p in
    ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
     "java.net", "java.nio", "java.util", "java.util.concurrent",
     "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
     "sun.security.action", "sun.util.calendar"])


def ch(url, sql, data=None):
    """POST a query (body = SQL) or an insert (query in the URL, body =
    rows) to the ClickHouse HTTP interface."""
    import urllib.parse
    if data is None:
        req = urllib.request.Request(
            url + "/?default_format=TSVWithNames", data=sql.encode(),
            headers={"Content-Type": "text/plain"}, method="POST")
    else:
        req = urllib.request.Request(
            f"{url}/?query={urllib.parse.quote(sql)}", data=data,
            headers={"Content-Type": "text/plain"}, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read().decode()


def main():
    url = os.environ.get("GRAFT_CLICKHOUSE_URL")
    if not url:
        print("SKIP chdiff: GRAFT_CLICKHOUSE_URL is not set "
              "(no ClickHouse reachable in this environment)")
        return 0
    import pandas as pd
    sf_dir = sys.argv[1]
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_chdiff"
    keys = ",".join(sorted(CH_QUERIES))
    jar = "target/scala-2.13/ed_clickhousespark_2.13-0.1.0.jar"
    subprocess.run(
        f"java {ADDOPENS} -Xmx8g -Dspark.ui.enabled=false "
        f"-Dspark.sql.session.timeZone=UTC -cp '{jar}:/opt/spark/jars/*' "
        f"graft.Verify {sf_dir} {work}/spark '{keys}'",
        shell=True, check=True)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ch(url, f"DROP TABLE IF EXISTS {TABLE}")
    ch(url, f"""CREATE TABLE {TABLE} (
          event_id Int64, user_id Int64, event_type String,
          ts DateTime64(6, 'UTC'), value Float64, props String)
        ENGINE = MergeTree ORDER BY (user_id, ts, event_id)""")
    buf = io.StringIO()
    ev.to_csv(buf, sep="\t", header=False, index=False,
              columns=["event_id", "user_id", "event_type", "ts",
                       "value", "props"])
    ch(url, f"INSERT INTO {TABLE} FORMAT TSV", buf.getvalue().encode())
    report = {}
    for key, (sql, expect) in sorted(CH_QUERIES.items()):
        import glob
        got = pd.concat([pd.read_parquet(p) for p in
                         glob.glob(f"{work}/spark/{key}/*.parquet")])
        raw = ch(url, sql)
        want = pd.read_csv(io.StringIO(raw), sep="\t")
        got = got[sorted(got.columns)].astype(str) \
            .sort_values(by=sorted(got.columns)).reset_index(drop=True)
        want = want[sorted(want.columns)].astype(str) \
            .sort_values(by=sorted(want.columns)).reset_index(drop=True)
        match = list(got.columns) == list(want.columns) and got.equals(want)
        status = ("MATCH" if match else "DIFF")
        if expect == "divergence":
            status += " (documented-divergence expected)" if not match \
                else " (!! expected a divergence)"
        print(f"{status:40s} {key}")
        report[key] = {"match": bool(match), "expect": expect,
                       "spark_rows": len(got), "ch_rows": len(want)}
    out = f"{work}/chdiff_report.json"
    os.makedirs(work, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {out}")
    bad = [k for k, v in report.items()
           if v["expect"] == "equal" and not v["match"]]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
