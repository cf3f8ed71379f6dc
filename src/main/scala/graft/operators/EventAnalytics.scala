package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClickHouse's event-analytics signatures — `windowFunnel` and
  * `retention` — the queries the reference's 9 event tables exist to
  * serve (CH 22.3 [implied]; a video-streaming product's
  * signup→engage→convert reporting over the migration DDLs' ORDER BY
  * (timestamp, event_name) layouts).
  *
  * Semantics chosen to be EXACTLY SQL-expressible (so both operators are
  * fully DuckDB-oracled, unlike CH's greedy cursor variant whose
  * tie-handling is engine-private):
  *  - funnel level (window w): level >= k iff an increasing-timestamp
  *    chain e1 < e2 < ... < ek exists with the k stage predicates and
  *    ek.ts <= e1.ts + w (the EXISTS-chain reading of windowFunnel);
  *  - retention: per cohort (first-signup date), the share of users with
  *    a follow-up event inside a fixed horizon after their first signup.
  *
  * Scale shape: every join is keyed on user_id (hash-shuffle once per
  * side, AQE-coalesced), chains verified with left-semi joins — no
  * row-multiplying output, no window over the full event stream. The
  * per-stage event slices are narrow (ts, user_id) projections that
  * push down to the parquet scan.
  */
object EventAnalytics {
  type Q = (SparkSession, String) => DataFrame

  private def stage(s: SparkSession, d: String, t: String) =
    Tables.events(s, d).filter(col("event_type") === t).select("user_id", "ts")

  val queries: Map[String, Q] = Map(
    // O-A15: windowFunnel(12 hours)(signup -> click -> purchase).
    // 12h picked because it yields all three levels at every test SF
    // (7 days saturates: every signup converts).
    "o_a15_funnel" -> ((s, d) => {
      val signup = stage(s, d, "signup").persist()
      val click = stage(s, d, "click")
      val purchase = stage(s, d, "purchase")
      val w = expr("INTERVAL 12 HOURS")
      // pairs reaching level 2: (signup, click) chains — keep the chain's
      // bounds so level 3 extends it without re-deriving the window
      // One row per (user, signup): extending a chain only gets easier as
      // the click time decreases (p.ts > t2 && p.ts <= t1 + w is monotone
      // in t2), so min(click ts) per signup is equivalent to keeping every
      // pair — and caps the persisted cache and the level-3 join input at
      // |signups| instead of |signups| x |clicks| for heavy users.
      val l2pairs = signup.as("s").join(click.as("c"),
        col("c.user_id") === col("s.user_id") &&
          col("c.ts") > col("s.ts") && col("c.ts") <= col("s.ts") + w)
        .groupBy(col("s.user_id").as("user_id"), col("s.ts").as("t1"))
        .agg(min(col("c.ts")).as("t2"))
        .persist()
      val l2 = l2pairs.select("user_id").distinct()
      val l3 = l2pairs.as("l").join(purchase.as("p"),
          col("p.user_id") === col("l.user_id") &&
            col("p.ts") > col("l.t2") && col("p.ts") <= col("l.t1") + w,
          "left_semi")
        .select("user_id").distinct()
      val out = signup.select("user_id").distinct()
        .join(l2.withColumn("has2", lit(1)), Seq("user_id"), "left")
        .join(l3.withColumn("has3", lit(1)), Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1) + coalesce(col("has2"), lit(0)) + coalesce(col("has3"), lit(0)))
            .as("funnel_level"))
        .groupBy("funnel_level").agg(count(lit(1)).as("n_users"))
        .orderBy("funnel_level")
      graft.pipeline.Materialize.drop(out, signup, l2pairs)
    }),

    // O-A16: retention — per first-signup cohort date, users returning
    // with a click within 3 days / purchasing within 7 days.
    "o_a16_retention" -> ((s, d) => {
      val first = stage(s, d, "signup")
        .groupBy("user_id").agg(min("ts").as("t0"))
      val click = stage(s, d, "click")
      val purchase = stage(s, d, "purchase")
      val flags = first.as("f")
        .join(click.as("c"),
          col("c.user_id") === col("f.user_id") &&
            col("c.ts") > col("f.t0") &&
            col("c.ts") <= col("f.t0") + expr("INTERVAL 3 DAYS"), "left")
        .groupBy(col("f.user_id").as("user_id"), col("f.t0").as("t0"))
        .agg(max(when(col("c.ts").isNotNull, 1).otherwise(0)).as("clicked"))
        .as("fc")
        .join(purchase.as("p"),
          col("p.user_id") === col("fc.user_id") &&
            col("p.ts") > col("fc.t0") &&
            col("p.ts") <= col("fc.t0") + expr("INTERVAL 7 DAYS"), "left")
        .groupBy(col("fc.user_id"), col("fc.t0"), col("fc.clicked"))
        .agg(max(when(col("p.ts").isNotNull, 1).otherwise(0)).as("purchased"))
      flags
        .groupBy(to_date(col("t0")).as("cohort_date"))
        .agg(count(lit(1)).as("n_users"),
          sum("clicked").as("n_clicked"),
          sum("purchased").as("n_purchased"))
        .orderBy("cohort_date")
    })
  )

  val oracles: Map[String, String] = Map(
    "o_a15_funnel" ->
      """WITH s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
            c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
            p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
            l2p AS (
              SELECT s.user_id, s.ts AS t1, c.ts AS t2
              FROM s JOIN c ON c.user_id = s.user_id
                AND c.ts > s.ts AND c.ts <= s.ts + INTERVAL 12 HOUR),
            l2 AS (SELECT DISTINCT user_id FROM l2p),
            l3 AS (
              SELECT DISTINCT l.user_id
              FROM l2p l JOIN p ON p.user_id = l.user_id
                AND p.ts > l.t2 AND p.ts <= l.t1 + INTERVAL 12 HOUR),
            u AS (SELECT DISTINCT user_id FROM s)
         SELECT CAST(1 + (l2.user_id IS NOT NULL)::INT + (l3.user_id IS NOT NULL)::INT AS INT)
                  AS funnel_level,
                COUNT(*) AS n_users
         FROM u LEFT JOIN l2 USING (user_id) LEFT JOIN l3 USING (user_id)
         GROUP BY funnel_level ORDER BY funnel_level""",

    "o_a16_retention" ->
      """WITH f AS (
           SELECT user_id, MIN(ts) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id
         ), flags AS (
           SELECT f.user_id, f.t0,
                  MAX(CASE WHEN c.ts IS NOT NULL THEN 1 ELSE 0 END) AS clicked,
                  MAX(CASE WHEN p.ts IS NOT NULL THEN 1 ELSE 0 END) AS purchased
           FROM f
           LEFT JOIN events c ON c.event_type = 'click' AND c.user_id = f.user_id
             AND c.ts > f.t0 AND c.ts <= f.t0 + INTERVAL 3 DAY
           LEFT JOIN events p ON p.event_type = 'purchase' AND p.user_id = f.user_id
             AND p.ts > f.t0 AND p.ts <= f.t0 + INTERVAL 7 DAY
           GROUP BY f.user_id, f.t0
         )
         SELECT CAST(t0 AS DATE) AS cohort_date,
                COUNT(*) AS n_users,
                CAST(SUM(clicked) AS BIGINT) AS n_clicked,
                CAST(SUM(purchased) AS BIGINT) AS n_purchased
         FROM flags GROUP BY cohort_date ORDER BY cohort_date"""
  )
}
