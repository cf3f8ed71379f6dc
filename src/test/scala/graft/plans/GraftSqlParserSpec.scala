package graft.plans

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** CH-dialect parse-time rewrite ([[GraftSqlParser]]): the clause shapes,
  * the untouchability of strings/subqueries/ordinary SQL, and the loud
  * failure modes. Result-level correctness of the rewrites is pinned by
  * the DuckDB oracles (o_s7/o_s8) and the HttpSqlSpec e2e. */
class GraftSqlParserSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def rw(sql: String): String = GraftSqlDialect.rewrite(sql, spark)

  test("ordinary SQL — including Spark-internal statements — passes byte-identical") {
    val untouched = Seq(
      "SELECT 1",
      "SELECT a FROM t ORDER BY a LIMIT 5",
      "SELECT a, count(*) FROM t GROUP BY a",
      "CREATE TABLE t (a INT) USING parquet",
      // the clause text inside a STRING literal is data, not syntax
      "SELECT 'LIMIT 3 BY k' AS s FROM t",
      "SELECT '... SAMPLE 1/16 ...' AS s FROM t",
      // a subquery's own LIMIT is below top level
      "SELECT * FROM (SELECT a FROM t ORDER BY a LIMIT 3) q ORDER BY a")
    untouched.foreach(s => assert(rw(s) eq s, s"should pass through: $s"))
  }

  test("LIMIT n BY rewrites to the row_number window; tail LIMIT survives") {
    val out = rw("SELECT a, b FROM t ORDER BY b DESC, a LIMIT 3 BY a LIMIT 10")
    assert(out.contains("row_number() OVER (PARTITION BY a ORDER BY b DESC, a)"))
    assert(out.contains("__graft_rn <= 3"))
    assert(out.contains("EXCEPT (__graft_rn)"))
    assert(out.trim.endsWith("ORDER BY b DESC, a LIMIT 10"))
    // parenthesized key list loses ITS parens (PARTITION BY (a,b) would
    // read a struct) while expression parens inside keys survive
    val multi = rw("SELECT a, b, c FROM t ORDER BY c LIMIT 1 BY (a, b)")
    assert(multi.contains("PARTITION BY a, b ORDER BY c"))
  }

  test("LIMIT n BY without a top-level ORDER BY fails loudly") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      rw("SELECT a FROM t LIMIT 3 BY a")
    }
    assert(e.getMessage.contains("ORDER BY"))
    // an ORDER BY inside a subquery does not count
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      rw("SELECT a FROM (SELECT a FROM t ORDER BY a) q LIMIT 3 BY a")
    }
    assert(e2.getMessage.contains("ORDER BY"))
  }

  test("SAMPLE a/b rewrites to the md5-prefix filter aliased to the table") {
    spark.conf.set("graft.sample.key.tt", "id")
    try {
      val out = rw("SELECT count(*) FROM tt SAMPLE 3/16 WHERE x > 0")
      assert(out.contains("FROM (SELECT * FROM tt WHERE substring(md5("))
      assert(out.contains("1, 1) < '3') tt WHERE x > 0"))
      val out256 = rw("SELECT count(*) FROM tt SAMPLE 20/256")
      assert(out256.contains("1, 2) < '14'")) // 20 = 0x14
    } finally spark.conf.unset("graft.sample.key.tt")
  }

  test("SAMPLE failure modes are loud: no key, bad denominator, bad fraction") {
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      rw("SELECT 1 FROM nokey SAMPLE 1/16")
    }
    assert(e1.getMessage.contains("graft.sample.key.nokey"))
    spark.conf.set("graft.sample.key.tt", "id")
    try {
      val e2 = intercept[org.apache.spark.sql.AnalysisException] {
        rw("SELECT 1 FROM tt SAMPLE 1/10")
      }
      assert(e2.getMessage.contains("16 or 256"))
      val e3 = intercept[org.apache.spark.sql.AnalysisException] {
        rw("SELECT 1 FROM tt SAMPLE 16/16")
      }
      assert(e3.getMessage.contains("0 < a < b"))
    } finally spark.conf.unset("graft.sample.key.tt")
  }

  test("LIMIT BY composes with SAMPLE in one statement") {
    spark.conf.set("graft.sample.key.tt", "id")
    try {
      val out = rw(
        "SELECT a, b FROM tt SAMPLE 1/16 ORDER BY b LIMIT 2 BY a")
      assert(out.contains("md5") && out.contains("__graft_rn <= 2"))
    } finally spark.conf.unset("graft.sample.key.tt")
  }

  test("spark.sql end-to-end: LIMIT n BY over a temp view") {
    import spark.implicits._
    Seq((1, 10), (1, 9), (1, 8), (2, 7), (2, 6)).toDF("k", "v")
      .createOrReplaceTempView("lbt")
    val rows = spark.sql("SELECT k, v FROM lbt ORDER BY v DESC LIMIT 2 BY k")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((1, 10), (1, 9), (2, 7), (2, 6)))
    // output columns carry no rewrite artifacts
    assert(spark.sql(
      "SELECT k, v FROM lbt ORDER BY v DESC LIMIT 1 BY k").columns.toSeq ==
      Seq("k", "v"))
  }

  test("LIMIT BY ordering by an UNPROJECTED base column (injection shape)") {
    import spark.implicits._
    Seq((1, 10, "a"), (1, 9, "b"), (1, 8, "c"), (2, 7, "d"), (2, 6, "e"))
      .toDF("k", "v", "s").createOrReplaceTempView("lbt2")
    // v is not in the select list: the rewrite must inject the window and
    // hidden order columns into the base query's own scope
    val rows = spark.sql("SELECT k, s FROM lbt2 ORDER BY v DESC LIMIT 2 BY k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((1, "a"), (1, "b"), (2, "d"), (2, "e")))
    assert(spark.sql(
      "SELECT k, s FROM lbt2 ORDER BY v DESC LIMIT 2 BY k").columns.toSeq ==
      Seq("k", "s"))
  }

  test("LIMIT off, n BY rewrites to the rank band; randomized shapes match a reference") {
    val out = rw("SELECT a, b FROM t ORDER BY b DESC, a LIMIT 2, 3 BY a")
    assert(out.contains("__graft_rn > 2 AND __graft_rn <= 5"))
    // e2e + randomized: per-key pagination == the Scala reference
    import spark.implicits._
    val rnd = new scala.util.Random(1807)
    (0 until 6).foreach { draw =>
      val rows = (0 until (20 + rnd.nextInt(30)))
        .map(i => (rnd.nextInt(4), rnd.nextInt(100) * 10 + i, i))
      rows.toDF("k", "v", "id").createOrReplaceTempView("lbo")
      val off = rnd.nextInt(3)
      val n = 1 + rnd.nextInt(3)
      val got = spark.sql(
        s"SELECT k, v FROM lbo ORDER BY v DESC, id LIMIT $off, $n BY k")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      val want = rows.sortBy(r => (-r._2, r._3))
        .groupBy(_._1).values.flatMap(_.slice(off, off + n))
        .map(r => (r._1, r._2)).toSeq
        .sortBy { case (k, v) =>
          (-v, rows.find(r => r._1 == k && r._2 == v).get._3) }
      assert(got == want, s"draw $draw off=$off n=$n: $got != $want")
    }
  }

  test("WITH FILL rewrites to the spine LEFT JOIN; gaps fill with NULL measures") {
    val out = rw("SELECT a, n FROM t ORDER BY a WITH FILL STEP 2")
    assert(out.contains("explode(sequence("))
    assert(out.contains("(SELECT min(a) FROM __graft_wfb)"))
    assert(out.contains("LEFT JOIN __graft_wfb USING (a)"))
    assert(out.trim.endsWith("ORDER BY a"))
    // STEP INTERVAL passes through textually; tail LIMIT survives
    val iv = rw("SELECT h, n FROM t ORDER BY h WITH FILL " +
      "STEP INTERVAL 1 HOUR LIMIT 5")
    assert(iv.contains("INTERVAL 1 HOUR)) AS h") && iv.trim.endsWith("LIMIT 5"))
    // e2e over a temp view: integer series with gaps
    import spark.implicits._
    Seq((1, 10L), (2, 20L), (5, 50L), (9, 90L)).toDF("k", "v")
      .createOrReplaceTempView("wft")
    val rows = spark.sql("SELECT k, v FROM wft ORDER BY k WITH FILL")
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(rows.map(_._1).toSeq == (1 to 9),
      "default STEP 1 must densify the grid")
    assert(rows.toMap.apply(3).isEmpty && rows.toMap.apply(5).contains(50L),
      "filled rows carry NULL measures; observed rows keep theirs")
    // off-grid base rows SURVIVE (CH keeps original rows): step 2 from
    // min=1 puts k=2 off the 1,3,5,7,9 grid — still present
    val off = spark.sql("SELECT k, v FROM wft ORDER BY k WITH FILL STEP 2")
      .collect().map(_.getInt(0)).toSeq
    assert(off == Seq(1, 2, 3, 5, 7, 9), s"grid + off-grid originals: $off")
  }

  test("WITH FILL randomized shapes match an in-memory reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(1808)
    (0 until 6).foreach { draw =>
      val ks = (0 until (5 + rnd.nextInt(12)))
        .map(_ => rnd.nextInt(40)).distinct
      val rows = ks.map(k => (k, k.toLong * 100))
      rows.toDF("k", "v").createOrReplaceTempView("wfr")
      val step = 1 + rnd.nextInt(4)
      val got = spark.sql(
        s"SELECT k, v FROM wfr ORDER BY k WITH FILL STEP $step")
        .collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSeq
      val grid = (rows.map(_._1).min to rows.map(_._1).max by step).toSet
      val byK = rows.toMap
      val want = (grid ++ rows.map(_._1)).toSeq.sorted
        .map(k => (k, byK.get(k).map(_.longValue)))
      assert(got == want, s"draw $draw step=$step: $got != $want")
    }
  }

  test("WITH FILL FROM/TO bounds: grid is [FROM, TO), originals survive outside") {
    import spark.implicits._
    Seq((1, 10L), (2, 20L), (5, 50L), (9, 90L)).toDF("k", "v")
      .createOrReplaceTempView("wfb")
    // TO is exclusive (CH's reading): 8 is generated by no grid and is
    // not an original; 1 and 9 sit OUTSIDE the bounds and still survive
    val got = spark.sql(
      "SELECT k, v FROM wfb ORDER BY k WITH FILL FROM 2 TO 8")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2, 3, 4, 5, 6, 7, 9), s"bounds grid: $got")
    // randomized bound shapes vs the in-memory reference
    val rnd = new scala.util.Random(1809)
    (0 until 6).foreach { draw =>
      val ks = (0 until (5 + rnd.nextInt(12))).map(_ => rnd.nextInt(40))
        .distinct
      val rows = ks.map(k => (k, k.toLong * 100))
      rows.toDF("k", "v").createOrReplaceTempView("wfb")
      val step = 1 + rnd.nextInt(3)
      val from = rnd.nextInt(20)
      // keep TO above both candidate grid starts: sequence() errors on
      // an inverted range (the documented delta vs CH's empty fill)
      val to = math.max(from, ks.min) + 1 + rnd.nextInt(25)
      val (fc, tc) = (if (rnd.nextBoolean()) s"FROM $from" else "",
        s"TO $to")
      val got2 = spark.sql(
        s"SELECT k, v FROM wfb ORDER BY k WITH FILL $fc $tc STEP $step")
        .collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSeq
      val lo = if (fc.nonEmpty) from else rows.map(_._1).min
      val grid = (lo until to by step).toSet
      val byK = rows.toMap
      val want = (grid ++ rows.map(_._1)).toSeq.sorted
        .map(k => (k, byK.get(k).map(_.longValue)))
      assert(got2 == want,
        s"draw $draw $fc $tc STEP $step: $got2 != $want")
    }
  }

  test("WITH FILL failure modes are loud: scope, direction, modifiers, composition") {
    def failsWith(sql: String, needle: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException] { rw(sql) }
      assert(e.getMessage.contains(needle), s"$sql => ${e.getMessage}")
    }
    // WITH FILL with no preceding top-level ORDER BY passes through so a
    // CTE literally named `fill` keeps parsing; the delegate rejects the
    // real misuse with its own syntax error
    val noOrd = "SELECT a FROM t WITH FILL"
    assert(rw(noOrd) eq noOrd)
    val cte = "WITH fill AS (SELECT 1 AS a) SELECT a FROM fill ORDER BY a"
    assert(rw(cte) eq cte)
    failsWith("SELECT a, b FROM t ORDER BY a, b WITH FILL", "exactly ONE")
    failsWith("SELECT a FROM t ORDER BY a DESC WITH FILL", "ascending only")
    failsWith("SELECT a FROM t ORDER BY a + 1 WITH FILL", "column NAME")
    failsWith("SELECT a FROM t ORDER BY a WITH FILL INTERPOLATE (b)",
      "INTERPOLATE is not")
    // bounds must come in CH's order: STEP before FROM / TO before FROM
    // leaves the bound as a loud leftover, never spliced SQL
    failsWith("SELECT a FROM t ORDER BY a WITH FILL STEP 2 FROM 1",
      "unsupported WITH FILL modifier 'FROM'")
    failsWith("SELECT a FROM t ORDER BY a WITH FILL TO 9 FROM 1",
      "unsupported WITH FILL modifier 'FROM'")
    failsWith("SELECT a FROM t ORDER BY a WITH FILL FROM STEP 2",
      "FROM needs")
    failsWith(
      "SELECT a, b FROM t ORDER BY a WITH FILL LIMIT 2 BY b", "compose")
    // inside a string literal the clause is data
    val s = "SELECT 'ORDER BY a WITH FILL' AS x FROM t"
    assert(rw(s) eq s)
  }

  test("backslash-escaped quotes inside string literals stay literal (r17 ADVICE)") {
    // the escaped quote must NOT flip the scanner to code mode: the
    // clause text after it is still string data
    val s1 = "SELECT 'it\\'s LIMIT 3 BY k' AS s FROM t ORDER BY s"
    assert(rw(s1) eq s1, "escaped quote + clause text must pass through")
    val s2 = "SELECT 'a\\' SAMPLE 1/16 (' AS s FROM t"
    assert(rw(s2) eq s2, "escaped quote + paren text must pass through")
    // a REAL clause after a string containing escapes still rewrites
    val s3 = "SELECT k, 'x\\'y' AS s FROM t ORDER BY k LIMIT 2 BY k"
    assert(rw(s3).contains("__graft_rn <= 2"))
    // legacy escapedStringLiterals mode: backslash is a literal char,
    // so 'a\' is a COMPLETE string and the clause after it is code
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try {
      val s4 = "SELECT k, 'a\\' AS s FROM t ORDER BY k LIMIT 2 BY k"
      assert(rw(s4).contains("__graft_rn <= 2"),
        "legacy mode must treat the backslash as literal")
    } finally spark.conf.unset("spark.sql.parser.escapedStringLiterals")
  }

  test("SAMPLE: multipart-name keys win over bare names; every occurrence rewrites") {
    spark.conf.set("graft.sample.key.db1.t", "id1")
    spark.conf.set("graft.sample.key.t", "id0")
    try {
      // qualified name resolves its own key, not the bare-name fallback
      val out = rw("SELECT count(*) FROM db1.t SAMPLE 1/16")
      assert(out.contains("md5(cast(cast(id1 AS STRING)"))
      // unqualified name keeps the bare key
      assert(rw("SELECT count(*) FROM t SAMPLE 1/16")
        .contains("md5(cast(cast(id0 AS STRING)"))
      // a UNION of two sampled SELECTs has TWO top-level occurrences —
      // both must rewrite (r17 ADVICE: only the first used to)
      spark.conf.set("graft.sample.key.u", "uid")
      val two = rw(
        "SELECT k FROM t SAMPLE 1/16 UNION ALL SELECT k FROM u SAMPLE 2/16")
      assert(two.contains("id0") && two.contains("uid"),
        s"both top-level SAMPLEs must rewrite: $two")
      assert(!two.toUpperCase.contains(" SAMPLE "), s"no SAMPLE left: $two")
    } finally {
      spark.conf.unset("graft.sample.key.db1.t")
      spark.conf.unset("graft.sample.key.t")
      spark.conf.unset("graft.sample.key.u")
    }
  }

  test("LIMIT BY ordering by a GROUP BY aggregate alias (wrapping shape)") {
    import spark.implicits._
    Seq((1, "x"), (1, "x"), (1, "y"), (2, "z"), (2, "z"), (2, "z"))
      .toDF("k", "g").createOrReplaceTempView("lbt3")
    // the common CH idiom: top-1 group per key by count alias
    val rows = spark.sql(
      "SELECT k, g, count(*) AS cnt FROM lbt3 GROUP BY k, g " +
        "ORDER BY cnt DESC, g LIMIT 1 BY k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.toSet == Set((1, "x", 2L), (2, "z", 3L)))
  }
}
