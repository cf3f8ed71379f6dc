package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** ClickHouse SQL-dialect shim for the analyst entry point: the literal
  * CH clauses a user of the reference types at ports 8123/9000
  * (`/root/reference/build/docker-compose.yml:8-9` routes them to a
  * deployed ClickHouse 22.3) — `LIMIT [offset,] n BY k`, `SAMPLE a/b`
  * and `ORDER BY c WITH FILL [FROM x] [TO y] [STEP n]` — are rewritten
  * AT PARSE TIME
  * into standard Spark SQL and handed to the delegate parser, so
  * `spark.sql("... LIMIT 3 BY k")` and the S-HTTP server both accept
  * them. Installed by [[graft.functions.GraftExtensions]] via
  * `injectParser`.
  *
  * The rewrite is purely textual over TOP-LEVEL tokens (a scanner skips
  * string/identifier literals, comments, and parenthesized subtext, so a
  * `'LIMIT 3 BY'` inside a string or a subquery's own clauses are never
  * touched):
  *
  *  - `… ORDER BY o LIMIT n BY cols [LIMIT m] [OFFSET j]` becomes the
  *    o_w2 row_number window plan:
  *    {{{
  *    SELECT * EXCEPT (__graft_rn) FROM (
  *      SELECT *, row_number() OVER (PARTITION BY cols ORDER BY o)
  *        AS __graft_rn FROM ( base ) __graft_lb) __graft_lb2
  *    WHERE __graft_rn <= n ORDER BY o [LIMIT m] [OFFSET j]
  *    }}}
  *    A top-level ORDER BY is REQUIRED: CH's LIMIT BY keeps the first n
  *    rows per key in result order, and without an explicit order that
  *    selection is nondeterministic — this engine refuses loudly rather
  *    than returning engine-private rows (the determinism convention the
  *    whole oracle gate rests on). Scope handling is per query: when
  *    every ORDER BY / BY identifier is projected, the whole base wraps
  *    as a subquery (so SELECT aliases work — `ORDER BY cnt DESC LIMIT 3
  *    BY k` over a GROUP BY); when the order references UNPROJECTED base
  *    columns, the window and hidden order columns are injected into the
  *    base's own select list instead (FROM-scope expressions work;
  *    mixing an alias with an unprojected column in one ORDER BY is the
  *    one shape a textual rewrite cannot straddle and fails at analysis
  *    naming the alias).
  *  - `FROM tbl SAMPLE a/b` (b ∈ {16, 256}, 0 < a < b) becomes a
  *    deterministic md5-prefix filter — CH samples by a hash of the
  *    table's declared sampling key, NOT an RNG, so the same rows are
  *    drawn on every run and every cluster size (the o_s6 device). The
  *    sampling key is the engine's stand-in for CH's `SAMPLE BY` table
  *    clause: set `graft.sample.key.<tbl> = <column>` on the session
  *    conf; an unset key fails loudly (CH likewise rejects SAMPLE on a
  *    table with no SAMPLE BY). The filter is a pushdown-friendly
  *    `substring(md5(key), 1, len) < bound` over the subquery aliased
  *    back to the table name, so qualified references keep resolving.
  *
  * Everything else — including every statement Spark itself issues —
  * passes through byte-identical (a cheap substring guard skips the
  * scanner entirely when neither clause can be present).
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(GraftSqlDialect.rewrite(sqlText, session))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(GraftSqlDialect.rewrite(sqlText, session))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlDialect {

  // CH grammar: LIMIT [offset_value, ]n BY expressions
  private val limitByRe = """(?i)\bLIMIT\s+(\d+)\s*(?:,\s*(\d+))?\s+BY\b""".r
  private val orderByRe = """(?i)\bORDER\s+BY\b""".r
  private val tailKwRe = """(?i)\b(LIMIT|OFFSET)\b""".r
  private val sampleRe =
    """(?i)\bFROM\s+([A-Za-z_][A-Za-z0-9_.]*)\s+SAMPLE\s+(\d+)\s*/\s*(\d+)\b""".r

  /** Dialect misuse is the PERMANENT error class (the reference's
    * dead-letter classifier keys on parse/analysis vs execution; S-HTTP
    * answers 400) — AnalysisException, not a bare IllegalArgument that
    * would read as a 500 execution failure. USER_RAISED_EXCEPTION is the
    * message-only error class raise_error() uses. */
  def fail(why: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "USER_RAISED_EXCEPTION",
      Map("errorMessage" -> s"graft CH-dialect: $why"))

  /** Depth per character position; -1 inside string/backtick/double-quote
    * literals and comments. Top-level code = depth 0.
    *
    * `backslashEscapes`: Spark's DEFAULT string literals honor backslash
    * escapes ('it\'s'), so the scanner must skip the character after a
    * backslash inside '…'/"…" or an escaped quote would flip it back to
    * code mode mid-literal and clause-like text in the string could be
    * rewritten (r17 ADVICE). False only when the session sets
    * `spark.sql.parser.escapedStringLiterals` (the legacy mode where a
    * backslash is a literal character). */
  private[plans] def depths(s: String,
                            backslashEscapes: Boolean = true): Array[Int] = {
    val d = new Array[Int](s.length)
    var depth = 0
    var mode = 0 // 0 code; 1 '…'; 2 "…"; 3 `…`; 4 -- comment; 5 /* comment
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      mode match {
        case 0 =>
          if (c == '\'') { d(i) = -1; mode = 1 }
          else if (c == '"') { d(i) = -1; mode = 2 }
          else if (c == '`') { d(i) = -1; mode = 3 }
          else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
            d(i) = -1; mode = 4
          } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
            d(i) = -1; mode = 5
          } else if (c == '(') { d(i) = depth; depth += 1 }
          else if (c == ')') { depth -= 1; d(i) = depth }
          else d(i) = depth
        case 1 | 2 =>
          d(i) = -1
          if (c == '\\' && backslashEscapes && i + 1 < s.length) {
            d(i + 1) = -1; i += 1 // skip the escaped character
          } else if (c == '\'' && mode == 1) mode = 0 // '' = close+reopen
          else if (c == '"' && mode == 2) mode = 0
        case 3 => d(i) = -1; if (c == '`') mode = 0
        case 4 => d(i) = -1; if (c == '\n') mode = 0
        case 5 =>
          d(i) = -1
          if (c == '/' && i > 0 && s.charAt(i - 1) == '*') mode = 0
      }
      i += 1
    }
    d
  }

  def rewrite(sql: String, session: SparkSession): String = {
    // fast path: neither clause can be present — leave internal and
    // ordinary statements byte-identical
    val u = sql.toUpperCase(java.util.Locale.ROOT)
    if (!u.contains("LIMIT") && !u.contains("SAMPLE") && !u.contains("FILL"))
      return sql
    // escapedStringLiterals = legacy literal-backslash mode (no escapes)
    val esc = !session.conf.get(
      "spark.sql.parser.escapedStringLiterals", "false").toBoolean
    rewriteLimitBy(rewriteWithFill(rewriteSample(sql, session, esc), esc), esc)
  }

  /** Split a fragment on top-level commas (commas inside parens or
    * literals stay put). */
  private def splitTopLevel(s: String, esc: Boolean): Seq[String] = {
    val d = depths(s, esc)
    val out = Seq.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ',' && d(i) == 0) {
        out += s.substring(start, i); start = i + 1
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** One ORDER BY item: the expression text and its direction suffix
    * (`DESC NULLS FIRST` etc., possibly empty). */
  private case class OrdItem(expr: String, dir: String)

  private val dirSuffixRe =
    """(?i)(\s+(ASC|DESC))?(\s+NULLS\s+(FIRST|LAST))?\s*$""".r

  private def ordItems(ordText: String, esc: Boolean): Seq[OrdItem] =
    splitTopLevel(ordText, esc).map { it =>
      val m = dirSuffixRe.findFirstMatchIn(it).get // $-anchored: always hits
      OrdItem(it.substring(0, m.start).trim, it.substring(m.start).trim)
    }

  private val identRe = """^[A-Za-z_][A-Za-z0-9_]*$""".r

  private def rewriteLimitBy(sql: String, esc: Boolean): String = {
    val d = depths(sql, esc)
    val hit = limitByRe.findAllMatchIn(sql).find(m => d(m.start) == 0)
      .getOrElse(return sql)
    // CH's LIMIT [offset,] n BY: with two numbers the FIRST is the
    // per-key offset (skip `off`, keep the next `n` rows per key)
    val (off, n) =
      if (hit.group(2) == null) (0L, hit.group(1).toLong)
      else (hit.group(1).toLong, hit.group(2).toLong)
    if (n <= 0) fail(s"LIMIT${if (off > 0) s" $off," else ""} $n BY: " +
      "n must be positive")
    val ord = orderByRe.findAllMatchIn(sql.substring(0, hit.start))
      .filter(o => d(o.start) == 0).toSeq.lastOption.getOrElse(fail(
        "LIMIT n BY requires a top-level ORDER BY: CH keeps the first n " +
          "rows PER KEY in result order, and without an explicit order " +
          "that selection is engine-private — name the order"))
    val ordText = sql.substring(ord.end, hit.start).trim
    val base = sql.substring(0, ord.start).trim
    val colsEnd = tailKwRe.findAllMatchIn(sql)
      .find(k => k.start >= hit.end && d(k.start) == 0)
      .map(_.start).getOrElse(sql.length)
    var cols = sql.substring(hit.end, colsEnd).trim
    // CH allows LIMIT n BY (k1, k2); PARTITION BY (k1, k2) would read a
    // struct, so strip one full enclosing pair
    if (cols.startsWith("(") && cols.endsWith(")") &&
        depths(cols, esc).drop(1).dropRight(1).forall(_ >= 1))
      cols = cols.substring(1, cols.length - 1).trim
    if (cols.isEmpty) fail("LIMIT n BY needs at least one key column")
    val tail = sql.substring(colsEnd).trim

    // Two rewrite shapes, picked per query:
    //  - WRAP the whole base as a subquery when every ORDER BY / BY
    //    identifier is projected (covers SELECT aliases — the common CH
    //    idiom `ORDER BY cnt DESC LIMIT 3 BY k` over a GROUP BY);
    //  - INJECT the window + hidden order columns into the base's own
    //    select list when the order references UNPROJECTED base columns
    //    (they resolve in the base's FROM scope; aliases don't — the one
    //    scope a textual rewrite cannot straddle, stated in the docs).
    val dBase = depths(base, esc)
    val selM = """(?i)\bSELECT\b""".r.findAllMatchIn(base)
      .find(m => dBase(m.start) == 0)
    val fromM = """(?i)\bFROM\b""".r.findAllMatchIn(base)
      .find(m => dBase(m.start) == 0 && selM.exists(_.end <= m.start))
    val selList = (selM, fromM) match {
      case (Some(s), Some(f)) => Some(base.substring(s.end, f.start))
      case _ => None
    }
    val hasSetOp = """(?i)\b(UNION|INTERSECT|EXCEPT)\b""".r
      .findAllMatchIn(base).exists(m => dBase(m.start) == 0)
    val isDistinct =
      selList.exists(_.trim.toUpperCase(java.util.Locale.ROOT)
        .startsWith("DISTINCT"))
    val items = ordItems(ordText, esc)
    val byCols = splitTopLevel(cols, esc)
    def projected(x: String): Boolean =
      identRe.findFirstIn(x).isDefined && selList.exists(sl =>
        ("""(?i)\b""" + java.util.regex.Pattern.quote(x) + """\b""").r
          .findFirstIn(sl).isDefined)
    val allProjected = (items.map(_.expr) ++ byCols).forall(projected)

    // offset form: skip the first `off` rows per key, keep the next n
    val rnPred =
      if (off == 0) s"__graft_rn <= $n"
      else s"__graft_rn > $off AND __graft_rn <= ${off + n}"
    if (allProjected || hasSetOp || isDistinct || selList.isEmpty) {
      s"""SELECT * EXCEPT (__graft_rn) FROM (
         |  SELECT *, row_number() OVER (PARTITION BY $cols ORDER BY $ordText)
         |    AS __graft_rn
         |  FROM ( $base ) __graft_lb) __graft_lb2
         |WHERE $rnPred ORDER BY $ordText $tail""".stripMargin
    } else {
      val hidden = items.zipWithIndex
        .map { case (it, i) => s"${it.expr} AS __graft_o$i" }
      val outerOrd = items.zipWithIndex
        .map { case (it, i) => s"__graft_o$i ${it.dir}".trim }
      val except = "__graft_rn" +: items.indices.map(i => s"__graft_o$i")
      val injected = base.substring(0, fromM.get.start) +
        s", ${hidden.mkString(", ")}, row_number() OVER (PARTITION BY " +
        s"$cols ORDER BY $ordText) AS __graft_rn " +
        base.substring(fromM.get.start)
      s"""SELECT * EXCEPT (${except.mkString(", ")}) FROM (
         |  $injected ) __graft_lb
         |WHERE $rnPred
         |ORDER BY ${outerOrd.mkString(", ")} $tail""".stripMargin
    }
  }

  private val withFillRe = """(?i)\bWITH\s+FILL\b""".r
  private val stepRe =
    """(?i)^STEP\s+(INTERVAL\s+\d+\s+[A-Za-z]+|\d+)\s*""".r

  /** `ORDER BY c [ASC] WITH FILL [STEP n | STEP INTERVAL n unit]` — the
    * third CH SELECT-ism (after LIMIT BY and SAMPLE) an arriving analyst
    * types: gap-fill the result over the fill column's observed [min,
    * max] grid. Rewritten to the o_s5 spine shape — the base wrapped as
    * a CTE, spine = explode(sequence(min, max, step)) over scalar
    * subqueries UNIONed with the base's own fill values (CH keeps
    * original rows even off the step grid), LEFT JOIN back USING the
    * fill column, outer ORDER BY:
    * {{{
    * WITH __graft_wfb AS ( base )
    * SELECT * FROM (
    *   SELECT c FROM (SELECT explode(sequence(
    *       (SELECT min(c) FROM __graft_wfb),
    *       (SELECT max(c) FROM __graft_wfb), step)) AS c)
    *   UNION SELECT c FROM __graft_wfb) __graft_wfs
    * LEFT JOIN __graft_wfb USING (c) ORDER BY c [tail]
    * }}}
    * Scale: the spine's row count is the series length (data-size
    * independent) and the base is referenced through ONE CTE — in
    * practice a post-aggregate series, so even the multi-reference plan
    * is metadata-sized next to the scan (the o_s5 argument).
    *
    * `[FROM const] [TO const]` bounds (CH grammar order, before STEP)
    * replace the min/max scalar subqueries; TO is EXCLUSIVE per CH's
    * documented reading ("without the TO value"), enforced by a spine
    * filter since sequence() is end-inclusive. Original rows OUTSIDE
    * the bounds are still kept (the UNION side) — CH keeps them too;
    * only the generated grid is bounded.
    *
    * Stated deltas vs CH 22.3, each failing LOUDLY where it applies:
    * filled measure columns are NULL (CH fills type defaults — 0/'' —
    * which erase the filled-vs-observed distinction; COALESCE restores
    * it per query); exactly ONE ORDER BY item, ascending (CH
    * multi-key/descending fill unimplemented; INTERPOLATE
    * unimplemented); an empty bound range (FROM past the data max with
    * no TO, or FROM >= TO) errors at sequence() rather than producing
    * zero filled rows; STEP defaults to 1, so a non-numeric fill column
    * NEEDS an explicit STEP (sequence() rejects the mismatch at
    * analysis); the fill column must be a projected column NAME (the
    * spine joins back by name); does not compose with LIMIT n BY in one
    * statement. */
  private def rewriteWithFill(sql: String, esc: Boolean): String = {
    val d = depths(sql, esc)
    // the LAST top-level occurrence is the clause position; a `WITH fill
    // AS (…)` CTE also matches the token pair but sits BEFORE any
    // top-level ORDER BY, so the no-ORDER-BY case must PASS THROUGH to
    // the delegate (which parses the CTE fine and rejects real misuse
    // with its own loud syntax error), never fail here
    val hit = withFillRe.findAllMatchIn(sql).filter(m => d(m.start) == 0)
      .toSeq.lastOption.getOrElse(return sql)
    val ord = orderByRe.findAllMatchIn(sql.substring(0, hit.start))
      .filter(o => d(o.start) == 0).toSeq.lastOption.getOrElse(return sql)
    if (limitByRe.findAllMatchIn(sql).exists(m => d(m.start) == 0))
      fail("WITH FILL does not compose with LIMIT n BY in one statement " +
        "(rewrite scope): materialize the LIMIT BY query as a subquery " +
        "and apply WITH FILL on the outer SELECT")
    val ordText = sql.substring(ord.end, hit.start).trim
    val items = splitTopLevel(ordText, esc)
    if (items.size != 1)
      fail(s"WITH FILL supports exactly ONE ORDER BY item (the fill " +
        s"column); got '$ordText' — interpolating across multiple sort " +
        "keys is not implemented")
    val sufM = dirSuffixRe.findFirstMatchIn(items.head).get
    val c = items.head.substring(0, sufM.start).trim
    val dir = items.head.substring(sufM.start).trim
    if (dir.nonEmpty && !dir.equalsIgnoreCase("asc"))
      fail(s"WITH FILL fills ascending only; got '$c $dir' (CH's " +
        "descending fill is not implemented)")
    if (identRe.findFirstIn(c).isEmpty)
      fail(s"WITH FILL needs the fill column as a projected column NAME " +
        s"(got '$c'): the spine joins back to the base by name — alias " +
        "the expression in the select list and order by the alias")
    var rest = sql.substring(hit.end).trim
    // CH grammar order: [FROM const] [TO const] [STEP const]. A bound
    // value runs to the next top-level keyword (depths() keeps keywords
    // inside literals — timestamp '…' — out of play).
    def takeValue(src: String, what: String,
                  stops: Seq[String]): (String, String) = {
      val dd = depths(src, esc)
      val re = ("(?i)\\b(" + stops.mkString("|") + ")\\b").r
      val (v, r2) = re.findAllMatchIn(src).find(m => dd(m.start) == 0) match {
        case Some(m) =>
          (src.substring(0, m.start).trim, src.substring(m.start).trim)
        case None => (src.trim, "")
      }
      if (v.isEmpty) fail(s"WITH FILL $what needs a constant expression")
      (v, r2)
    }
    var fromB: Option[String] = None
    var toB: Option[String] = None
    // FROM/TO are in each other's stop lists so an out-of-order or
    // repeated bound surfaces as the loud leftover-modifier failure
    // below instead of splicing into the generated SQL
    """(?i)^FROM\s+""".r.findFirstMatchIn(rest).foreach { m =>
      val (v, r2) = takeValue(rest.substring(m.end), "FROM",
        Seq("TO", "STEP", "LIMIT", "OFFSET", "FROM"))
      fromB = Some(v); rest = r2
    }
    """(?i)^TO\s+""".r.findFirstMatchIn(rest).foreach { m =>
      val (v, r2) = takeValue(rest.substring(m.end), "TO",
        Seq("STEP", "LIMIT", "OFFSET", "FROM", "TO"))
      toB = Some(v); rest = r2
    }
    val step = stepRe.findFirstMatchIn(rest) match {
      case Some(sm) => rest = rest.substring(sm.end).trim; sm.group(1)
      case None => "1"
    }
    val up = rest.toUpperCase(java.util.Locale.ROOT)
    if (!(rest.isEmpty || up.startsWith("LIMIT") || up.startsWith("OFFSET")))
      fail(s"unsupported WITH FILL modifier " +
        s"'${rest.takeWhile(!_.isWhitespace)}': only [FROM x] [TO y] " +
        "[STEP n | STEP INTERVAL n unit] is implemented, in CH's order " +
        "(INTERPOLATE is not)")
    val base = sql.substring(0, ord.start).trim
    val lo = fromB.getOrElse(s"(SELECT min($c) FROM __graft_wfb)")
    val hi = toB.getOrElse(s"(SELECT max($c) FROM __graft_wfb)")
    // TO is exclusive in CH; sequence() is end-inclusive when aligned
    val bound = toB.map(t => s" WHERE $c < $t").getOrElse("")
    s"""WITH __graft_wfb AS ( $base )
       |SELECT * FROM (
       |  SELECT $c FROM (SELECT explode(sequence(
       |      $lo,
       |      $hi, $step)) AS $c)$bound
       |  UNION
       |  SELECT $c FROM __graft_wfb) __graft_wfs
       |LEFT JOIN __graft_wfb USING ($c)
       |ORDER BY $c $rest""".stripMargin
  }

  /** Rewrites EVERY top-level `FROM tbl SAMPLE a/b` occurrence (a join of
    * two sampled tables is legal CH), looping because offsets shift per
    * rewrite; terminates since the replacement text holds no top-level
    * SAMPLE (the inner SELECT sits inside parens). The sampling key is
    * looked up under the FULL multipart name first (`graft.sample.key.
    * db.t`), then the bare last component — so `db1.t` and `db2.t` can
    * declare different keys while unqualified names keep working (r17
    * ADVICE: the bare-name-only lookup silently shared one key). */
  private def rewriteSample(sql: String, session: SparkSession,
                            esc: Boolean): String = {
    var cur = sql
    def nextHit = {
      val d = depths(cur, esc)
      sampleRe.findAllMatchIn(cur).find(m => d(m.start) == 0)
    }
    var found = nextHit
    while (found.isDefined) {
      val hit = found.get
      val table = hit.group(1)
      val a = hit.group(2).toInt
      val b = hit.group(3).toInt
      if (b != 16 && b != 256)
        fail(s"SAMPLE $a/$b: denominator must be 16 or 256 (the md5 hex " +
          "prefix device that both this engine and the DuckDB oracle can " +
          "evaluate deterministically)")
      if (a <= 0 || a >= b) fail(s"SAMPLE $a/$b: need 0 < a < b")
      val alias = table.split('.').last
      val key = session.conf.getOption(s"graft.sample.key.$table")
        .orElse(session.conf.getOption(s"graft.sample.key.$alias"))
        .getOrElse(fail(s"SAMPLE on '$table' needs a sampling key: set " +
          s"graft.sample.key.$table=<column> (or graft.sample.key.$alias) " +
          "on the session (the engine's stand-in for CH's SAMPLE BY " +
          "table clause)"))
      val (len, bound) =
        if (b == 16) (1, f"${a}%x") else (2, f"${a}%02x")
      val pred = s"substring(md5(cast(cast($key AS STRING) AS BINARY)), " +
        s"1, $len) < '$bound'"
      cur = cur.substring(0, hit.start) +
        s"FROM (SELECT * FROM $table WHERE $pred) $alias" +
        cur.substring(hit.end)
      found = nextHit
    }
    cur
  }
}
