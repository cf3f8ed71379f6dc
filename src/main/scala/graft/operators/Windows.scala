package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function catalog — SURVEY.md §2.5 (O-W1..O-W7) and the batch
  * equivalents of the event-time windows §2.9 (O-T8/T9/T10).
  *
  * All windows partition by a key (user_id / event_id / o_custkey) so the
  * single shuffle is on that key and state per partition stays bounded —
  * the layout that survives 100 TB. No global (unpartitioned) windows.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // O-W1: canonical at-least-once dedup view — row_number per event_id
    // (reference delivers duplicates by design: src/nats.rs:74,
    // src/handler.rs:132; SURVEY §1.4 "duplicate semantics").
    "o_w1_dedup" -> ((s, d) => {
      val w = Window.partitionBy("event_id")
        .orderBy(col("ts").asc_nulls_last, col("user_id")) // DuckDB NULLS LAST parity
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // O-W2: top-N per group (ClickHouse LIMIT n BY k).
    "o_w2_topn" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    // O-W3: lag — inter-event gap per user in microseconds (sessionization
    // input; integer math so the oracle compare is exact).
    "o_w3_lag" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc_nulls_last, col("event_id")) // DuckDB NULLS LAST parity
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
        .orderBy("event_id")
    }),

    // O-W4: running/cumulative aggregate with an explicit frame; the sum
    // runs over DECIMAL so prefix sums are exact and order-independent.
    "o_w4_running" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc_nulls_last, col("event_id")) // DuckDB NULLS LAST parity
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("run_n"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("run_v"))
        .orderBy("event_id")
    }),

    // O-W5: sliding frame — moving average over the last 4 rows, computed
    // as exact decimal sum / count so both engines agree bit-for-bit.
    "o_w5_moving" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc_nulls_last, col("event_id")) // DuckDB NULLS LAST parity
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          (sum(col("value").cast("decimal(18,2)")).over(w).cast("double") /
            count(lit(1)).over(w)).as("mov_avg"))
        .orderBy("event_id")
    }),

    // O-W6: rank / dense_rank / ntile leaderboard — WITHOUT a global
    // (unpartitioned) window, which would sort every customer on one
    // partition at scale. Ranks depend only on the n_orders VALUE, whose
    // domain is tiny (max orders per customer) and data-size independent:
    //   rank       = 1 + rows with a strictly greater value
    //   dense_rank = 1 + distinct values strictly greater
    // both read off a value-level dimension (per-value counts + a tiny
    // dim self-join for the running "above" totals) broadcast back onto
    // the rows. ntile's global row position = rows-above offset + a
    // PER-VALUE row_number (keyed window). Every shuffle is keyed on
    // n_orders or o_custkey; nothing single-partition.
    "o_w6_rank" -> ((s, d) => {
      // base feeds the main rows, the value dim, and the totals — one
      // executor-resident materialization instead of three orders scans.
      // localCheckpoint, not persist-and-release: base is a ≤|customers|
      // aggregate (15k rows at sf0.1), so the unreleased checkpoint
      // blocks are negligible, and the eager cut measured faster than a
      // lazy cache whose fill the three consumers' stages race
      val base = Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .localCheckpoint(true)
      val vals = base.groupBy("n_orders").agg(count(lit(1)).as("cnt"))
      val dim = vals.as("a")
        .join(vals.as("b"), col("b.n_orders") > col("a.n_orders"), "left")
        .groupBy(col("a.n_orders").as("n_orders"))
        .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("rows_above"),
          count(col("b.n_orders")).as("vals_above"))
      // global position = unit-weight distributed CDF over the total
      // order (n_orders, o_custkey) — NOT row_number() over a window
      // partitioned by n_orders: that key's small domain (~40 values)
      // would cap parallelism at 40 tasks forever (the o_a27 hazard,
      // one notch milder). cum == rows_above + per-value row_number by
      // construction; tot == the row total, replacing the totals cross
      // join as well.
      // the leaderboard ranks DESC by n_orders; weightedCdf orders asc,
      // so the sort column is the negation (n_orders restored after)
      val (cdf, caches) = OrderStats.weightedCdfPlan(
        base.withColumn("g", lit(1)).withColumn("one", lit(1L))
          .withColumn("neg_orders", -col("n_orders")),
        "g", Seq("neg_orders", "o_custkey"), "one")
      graft.pipeline.Materialize.drop(cdf
        .withColumn("n_orders", -col("neg_orders"))
        .withColumnRenamed("cum", "pos").withColumnRenamed("tot", "total")
        .join(broadcast(dim), "n_orders")
        .select(col("o_custkey"), col("n_orders"),
          (col("rows_above") + 1).cast("int").as("rnk"),
          (col("vals_above") + 1).cast("int").as("drnk"),
          // SQL ntile(4): the first (total % 4) buckets hold one extra row
          expr("""CAST(CASE WHEN pos <= (total DIV 4 + 1) * (total % 4)
                       THEN (pos - 1) DIV (total DIV 4 + 1) + 1
                       ELSE (total % 4) +
                            (pos - (total DIV 4 + 1) * (total % 4) - 1)
                              DIV (total DIV 4) + 1
                  END AS INT)""").as("quartile")), caches: _*)
        // sort AFTER the lineage cut (r18 opt): a final orderBy is a
        // range exchange whose boundary sampling re-executes the whole
        // un-materialized subtree below it — sorting the checkpointed
        // rows reads blocks instead; same rows, same order
        .orderBy("o_custkey")
    }),

    // O-W7: first/last value per key (first-touch attribution).
    "o_w7_firstlast" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc_nulls_last, col("event_id")) // DuckDB NULLS LAST parity
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("user_id"),
          first("event_type").over(w).as("first_type"),
          last("event_type").over(w).as("last_type"))
        .distinct()
        .orderBy("user_id")
    }),

    // O-W8: CH `groupArrayMovingSum(3)` / `groupArrayMovingAvg(3)` — the
    // moving aggregate at every position, in event order. Scalar-row
    // output (the adjudication harness can't sort list cells in pandas),
    // so ONE window pass computes the sliding decimal sum/avg AND the
    // ordinal — all three functions share the (user_id | ts, event_id)
    // sort, one exchange, no collect/posexplode round trip (that detour
    // only paid for itself when the OUTPUT was the per-user array).
    "o_w8_moving_collect" -> ((s, d) => {
      // value IS NOT NULL both sides (same latent NULL skew pin as o_w9).
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc_nulls_last, col("event_id")) // DuckDB NULLS LAST parity
      val frame = w.rowsBetween(-2, Window.currentRow)
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          sum(col("value").cast("decimal(18,2)")).over(frame)
            .cast("double").as("ms"),
          (sum(col("value").cast("decimal(18,2)")).over(frame).cast("double") /
            count(lit(1)).over(frame)).as("ma"))
        .select(col("user_id"),
          (row_number().over(w) - 1).cast("int").as("ord"),
          col("ms"), col("ma"))
        .orderBy("user_id", "ord")
    }),

    // O-W9: CH `exponentialMovingAverage` — per-user EMA over the event
    // stream, alpha = 1/2: ema_1 = x_1, ema_i = ema_{i-1}/2 + x_i/2.
    // The recursion is ORDER-DEPENDENT floating point, so the only
    // hash-exact formulation is the same left fold over the same ordered
    // list in both engines (Spark `aggregate` HOF ≡ DuckDB `list_reduce`;
    // identical IEEE op sequence ⇒ identical bits — and halving is
    // exponent-only, so the only rounding is in the adds, which both
    // engines execute in the same order). A window-sum-of-powers
    // rewrite would change summation order and flake the compare.
    "o_w9_ema" -> ((s, d) => {
      // value IS NOT NULL on both sides: collect_list skips NULLs while
      // DuckDB's list() keeps them — pin identical element lists so the
      // bit-exactness argument below holds for any fixture. ts IS NOT
      // NULL too: the EMA is an order-dependent fold over the time
      // order, and the engines disagree where a NULL ts sorts (Spark
      // struct ordering: first; DuckDB ORDER BY: last) — an event with
      // no event time has no place in a time-ordered recursion.
      Tables.events(s, d)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .groupBy("user_id")
        .agg(transform(array_sort(collect_list(struct(col("ts"),
          col("event_id"), col("value")))), x => x.getField("value")).as("vs"))
        .select(col("user_id"), size(col("vs")).as("n"),
          expr("""aggregate(slice(vs, 2, size(vs) - 1),
                    vs[0],
                    (acc, x) -> acc * 0.5D + x * 0.5D)""").as("ema"))
        .orderBy("user_id")
    }),

    // O-T8: event-time tumbling window (batch form; streaming form in
    // graft.streaming). window() starts are epoch-aligned == date_trunc.
    // ts IS NOT NULL on all three o_t* forms, explicit on BOTH sides: an
    // event with no event time belongs to no event-time bucket. Spark's
    // window()/session_window rewrite already drops such rows silently;
    // the oracles must drop them too, not emit a NULL bucket.
    "o_t8_tumbling" -> ((s, d) => {
      Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
        .orderBy("hour", "event_type")
    }),

    // O-T9: sliding window — 6h window sliding 1h; each event lands in 6
    // windows. At scale this is the "rolling active users" query.
    "o_t9_sliding" -> ((s, d) => {
      Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(window(col("ts"), "6 hours", "1 hour").getField("start").as("win_start"))
        .agg(count(lit(1)).as("n"))
        .orderBy("win_start")
    }),

    // O-T10: session window, 30-minute gap (batch session_window; the
    // is_ended-flag-driven variant lives in graft.streaming per SURVEY §7).
    "o_t10_session" -> ((s, d) => {
      Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
        .orderBy("user_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "o_w1_dedup" ->
      """SELECT event_type, COUNT(*) AS n FROM (
           SELECT event_type,
                  row_number() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
           FROM events) WHERE rn = 1
         GROUP BY event_type ORDER BY event_type""",

    "o_w2_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_custkey, rn""",

    "o_w3_lag" ->
      """SELECT user_id, event_id,
                epoch_us(ts) - lag(epoch_us(ts), 1)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
         FROM events ORDER BY event_id""",

    "o_w4_running" ->
      """SELECT event_id, user_id,
                COUNT(*) OVER w AS run_n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_v
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "o_w5_moving" ->
      """SELECT event_id, user_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                  / COUNT(*) OVER w AS mov_avg
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "o_w6_rank" ->
      """SELECT o_custkey, n_orders,
                CAST(rank() OVER (ORDER BY n_orders DESC) AS INT) AS rnk,
                CAST(dense_rank() OVER (ORDER BY n_orders DESC) AS INT) AS drnk,
                CAST(ntile(4) OVER (ORDER BY n_orders DESC, o_custkey) AS INT) AS quartile
         FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
         ORDER BY o_custkey""",

    "o_w7_firstlast" ->
      """SELECT DISTINCT user_id,
                first_value(event_type) OVER w AS first_type,
                last_value(event_type) OVER w AS last_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY user_id""",

    "o_w9_ema" ->
      """WITH g AS (
           SELECT user_id, list(value ORDER BY ts, event_id) AS vs
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           GROUP BY user_id)
         SELECT user_id, CAST(len(vs) AS INT) AS n,
                list_reduce(vs, (acc, x) -> acc * 0.5e0 + x * 0.5e0) AS ema
         FROM g ORDER BY user_id""",

    "o_w8_moving_collect" ->
      """WITH p AS (
           SELECT user_id, ts, event_id,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS ms,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                    / COUNT(*) OVER w AS ma
           FROM events
           WHERE value IS NOT NULL
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
         SELECT user_id,
                CAST(row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) - 1 AS INT) AS ord,
                ms, ma
         FROM p ORDER BY user_id, ord""",

    "o_t8_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
                COUNT(*) AS n, COUNT(DISTINCT user_id) AS users
         FROM events WHERE ts IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""",

    "o_t9_sliding" ->
      """SELECT date_trunc('hour', ts) - h * INTERVAL 1 HOUR AS win_start, COUNT(*) AS n
         FROM events, range(0, 6) t(h)
         WHERE ts IS NOT NULL
         GROUP BY 1 ORDER BY 1""",

    "o_t10_session" ->
      """WITH marks AS (
           SELECT user_id, ts,
                  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            >= INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS is_new
           FROM events WHERE ts IS NOT NULL),
         sess AS (
           SELECT user_id,
                  SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marks)
         SELECT user_id, COUNT(DISTINCT sid) AS n_sessions, COUNT(*) AS n_events
         FROM sess GROUP BY user_id ORDER BY user_id"""
  )
}
