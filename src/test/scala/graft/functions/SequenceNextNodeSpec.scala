package graft.functions

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `sequence_next_node` full operating surface (direction × base, N
  * conditions) pinned against a brute-force reference implementing the
  * documented contract directly — two mechanisms (sorted-array traversal
  * inside a TypedImperativeAggregate vs plain Scala over the event list),
  * one contract; the DuckDB window-form oracles (o_a21b/c/d) are the
  * third mechanism at the catalog gate. */
class SequenceNextNodeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val types = Vector("signup", "click", "purchase", "view")

  /** (us, tie, value, condition flags) — value null allowed. */
  private case class Ev(us: Long, tie: Long, value: String)

  /** The documented contract, straight-line: sort by (us, tie), reverse
    * for backward, anchor per base (gated by the base condition when one
    * is given), chain = consecutive traversal positions matching conds in
    * order, result = value after the chain ('NONE' at traversal end, null
    * value stays null). */
  private def reference(events: Seq[Ev], conds: Seq[String => Boolean],
                        direction: String, base: String,
                        baseCond: Option[String => Boolean] = None)
      : Option[String] = {
    if (events.isEmpty) return None
    val sorted = events.sortBy(e => (e.us, e.tie))
    val u = if (direction == "forward") sorted else sorted.reverse
    val n = u.size
    val N = conds.size
    def chainAt(p: Int): Boolean =
      p >= 0 && p + N <= n &&
        baseCond.forall(bc => u(p).value != null && bc(u(p).value)) &&
        (0 until N).forall(i => u(p + i).value != null && conds(i)(u(p + i).value))
    val anchor = base match {
      case "head" => if (direction == "forward") 0 else n - 1
      case "tail" => if (direction == "forward") n - 1 else 0
      case "first_match" => (0 to n - N).find(chainAt).getOrElse(-1)
      case "last_match" => (n - N to 0 by -1).find(chainAt).getOrElse(-1)
    }
    if (!chainAt(anchor)) None
    else if (anchor + N >= n) Some("NONE")
    else Option(u(anchor + N).value) // null value -> None here; see caller
  }

  /** The valid direction x base surface (forward+tail / backward+head
    * anchor at the traversal end and are rejected — r17 ADVICE). */
  private val validCombos =
    for (dir <- Seq("forward", "backward");
         base <- Seq("head", "tail", "first_match", "last_match")
         if !(dir == "forward" && base == "tail") &&
           !(dir == "backward" && base == "head")) yield (dir, base)

  /** Run the aggregate over one group and return its (nullable) result;
    * `baseCondSql` selects the sequence_next_node_base surface. */
  private def agg(events: Seq[Ev], condSql: Seq[String],
                  direction: String, base: String,
                  baseCondSql: Option[String] = None): Option[String] = {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    val df = events.map(e => (e.us, e.tie, e.value)).toDF("us", "tie", "v")
    val call = baseCondSql match {
      case None =>
        s"sequence_next_node('$direction', '$base', us, tie, v, " +
          condSql.mkString(", ") + ")"
      case Some(bc) =>
        s"sequence_next_node_base('$direction', '$base', us, tie, v, $bc, " +
          condSql.mkString(", ") + ")"
    }
    val r = df.agg(expr(call)).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("randomized tied streams: all 6 valid direction x base combos match the reference") {
    val rnd = new scala.util.Random(1701)
    val conds = Seq[String => Boolean](_ == "signup", _ == "click")
    val condSql = Seq("v = 'signup'", "v = 'click'")
    (0 until 12).foreach { draw =>
      // heavy ties: timestamps on a 4-slot grid so traversal order leans
      // on the tie column; ~16 events per draw
      val events = (0 until (4 + rnd.nextInt(14))).map { i =>
        Ev(rnd.nextInt(4).toLong * 1000, i.toLong, types(rnd.nextInt(types.size)))
      }
      validCombos.foreach { case (dir, base) =>
        val want = reference(events, conds, dir, base)
          // reference returns Option(null-value) as None already via Option()
        val got = agg(events, condSql, dir, base)
        assert(got == want,
          s"draw $draw $dir/$base: got $got want $want over $events")
      }
    }
  }

  test("degenerate forward+tail / backward+head pairings are rejected loudly") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    val df = Seq((1L, 1L, "signup")).toDF("us", "tie", "v")
    Seq(("forward", "tail"), ("backward", "head")).foreach { case (d, b) =>
      val e = intercept[Exception] {
        df.agg(expr(s"sequence_next_node('$d', '$b', us, tie, v, " +
          "v = 'signup', v = 'click')")).collect()
      }
      assert(e.getMessage.contains("END of the traversal"), s"$d/$b: $e")
    }
  }

  test("base_condition gates the anchor on randomized tied streams (all valid combos)") {
    val rnd = new scala.util.Random(1705)
    val conds = Seq[String => Boolean](_ == "signup", _ == "click")
    val condSql = Seq("v = 'signup'", "v = 'click'")
    // base condition on the anchor event's value: the CH churn idiom
    // "the pair must START from X" — here a parity-ish value predicate
    // that bites on some anchors and not others
    val bcFn: String => Boolean = v => v == "signup" || v == "view"
    val bcSql = "v IN ('signup', 'view')"
    (0 until 12).foreach { draw =>
      val events = (0 until (4 + rnd.nextInt(14))).map { i =>
        Ev(rnd.nextInt(4).toLong * 1000, i.toLong, types(rnd.nextInt(types.size)))
      }
      validCombos.foreach { case (dir, base) =>
        val want = reference(events, conds, dir, base, Some(bcFn))
        val got = agg(events, condSql, dir, base, Some(bcSql))
        assert(got == want,
          s"draw $draw $dir/$base + base_cond: got $got want $want over $events")
      }
      // a TRUE base condition degrades to the plain surface exactly
      val (dir, base) = validCombos(rnd.nextInt(validCombos.size))
      assert(agg(events, condSql, dir, base, Some("true")) ==
        agg(events, condSql, dir, base),
        s"draw $draw: base_cond=true must equal the plain form")
    }
  }

  test("three-condition chains traverse correctly in both directions") {
    val rnd = new scala.util.Random(1702)
    val conds = Seq[String => Boolean](_ == "signup", _ == "click", _ == "purchase")
    val condSql = Seq("v = 'signup'", "v = 'click'", "v = 'purchase'")
    (0 until 8).foreach { draw =>
      val events = (0 until (6 + rnd.nextInt(12))).map { i =>
        Ev(rnd.nextInt(3).toLong * 1000, i.toLong, types(rnd.nextInt(3)))
      }
      for (dir <- Seq("forward", "backward");
           base <- Seq("first_match", "last_match")) {
        // backward cond order: purchase/click/signup reads the time-order
        // chain signup->click->purchase back-to-front
        val want = reference(events, conds, dir, base)
        val got = agg(events, condSql, dir, base)
        assert(got == want, s"draw $draw $dir/$base: got $got want $want")
      }
    }
  }

  test("'NONE' is reserved for traversal end; a present NULL value returns null") {
    // chain at the end of the stream -> NONE
    assert(agg(Seq(Ev(1, 1, "signup"), Ev(2, 2, "click")),
      Seq("v = 'signup'", "v = 'click'"), "forward", "first_match")
      == Some("NONE"))
    // next event EXISTS with a NULL value -> null result, not 'NONE'
    // (r16 ADVICE: the old eval conflated the two)
    assert(agg(Seq(Ev(1, 1, "signup"), Ev(2, 2, "click"), Ev(3, 3, null)),
      Seq("v = 'signup'", "v = 'click'"), "forward", "first_match")
      == None)
    // backward twin: event BEFORE the time-order chain is the result
    assert(agg(Seq(Ev(1, 1, "view"), Ev(2, 2, "click"), Ev(3, 3, "purchase")),
      Seq("v = 'purchase'", "v = 'click'"), "backward", "first_match")
      == Some("view"))
    assert(agg(Seq(Ev(2, 2, "click"), Ev(3, 3, "purchase")),
      Seq("v = 'purchase'", "v = 'click'"), "backward", "first_match")
      == Some("NONE"))
  }

  test("historical 5-arg form == ('forward','first_match') with two conditions") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(1703)
    val df = (0 until 400).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(6).toLong * 1000, i.toLong,
        types(rnd.nextInt(types.size)))
    }.toDF("g", "us", "tie", "v")
    val legacy = df.groupBy("g")
      .agg(expr("sequence_next_node(us, tie, v, v = 'signup', v = 'click')")
        .as("nn"))
    val full = df.groupBy("g")
      .agg(expr("sequence_next_node('forward', 'first_match', us, tie, v, " +
          "v = 'signup', v = 'click')").as("nn"))
    assert(legacy.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet ==
      full.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet)
  }

  test("bad direction/base fail loudly at analysis") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    val df = Seq((1L, 1L, "a")).toDF("us", "tie", "v")
    val e1 = intercept[Exception] {
      df.agg(expr("sequence_next_node('sideways', 'head', us, tie, v, v = 'a')"))
        .collect()
    }
    assert(e1.getMessage.contains("direction"))
    val e2 = intercept[Exception] {
      df.agg(expr("sequence_next_node('forward', 'middle', us, tie, v, v = 'a')"))
        .collect()
    }
    assert(e2.getMessage.contains("base"))
  }
}
