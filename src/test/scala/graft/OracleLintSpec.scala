package graft

/** Oracle type-lint (VERDICT r11 ask #1b) — kills the recurring
  * HUGEINT→float64 bug class that produced the single red row two
  * rounds running (r10 t15 `SUM(cnt)`, r11 c15 `SUM(n_toks) OVER`):
  * DuckDB types SUM over integers as HUGEINT, pandas materializes
  * HUGEINT as float64, and the driver's hash then sees `10.0` against
  * Spark's `10` even when every value matches.
  *
  * The lint is static — it parses each `SparkEntry.oracleSql` string,
  * takes the FINAL top-level SELECT's output columns (intermediate CTE
  * sums are fine: they either feed double math or get cast before they
  * surface), back-traces bare identifiers to their defining `AS` alias,
  * and fails when a surfacing column is an integer SUM with no
  * enclosing CAST. Calibrated against all 156 round-11 oracles: flags
  * exactly the one row the driver flagged (c15), zero false positives.
  * `tools/check_oracle.py` carries the exact runtime twin (DESCRIBE
  * each oracle, fail on any HUGEINT result column); this spec is the
  * `sbt test` gate so a new un-cast SUM fails before Verify ever runs.
  */
class OracleLintSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val typeNames = Set(
    "bigint", "int", "integer", "double", "varchar", "date", "timestamp",
    "smallint", "tinyint", "hugeint", "float", "boolean", "bool",
    "decimal", "blob", "interval", "ubigint", "real")

  /** Parquet double columns of the fixture tables: SUM over these is
    * DOUBLE on both engines, so it never needs a cast.
    */
  private val doubleCols = Seq(
    "c_acctbal", "l_discount", "l_extendedprice", "l_quantity", "l_tax",
    "o_totalprice", "p_retailprice", "s_acctbal")

  /** Paren depth at every character position. */
  private def depths(s: String): Array[Int] = {
    val out = new Array[Int](s.length)
    var d = 0
    var i = 0
    while (i < s.length) {
      out(i) = d
      if (s(i) == '(') d += 1 else if (s(i) == ')') d -= 1
      i += 1
    }
    out
  }

  /** Every `expr AS alias` pair anywhere in the SQL: scan backward from
    * the AS keyword to the nearest same-depth comma / SELECT / opening
    * paren. CAST's `AS <type>` is excluded via the type-name set.
    */
  private def aliasedExprs(sql: String): Seq[(String, String)] = {
    val dep = depths(sql)
    val re = "(?i)\\bAS\\s+(\\w+)".r
    re.findAllMatchIn(sql).flatMap { m =>
      val alias = m.group(1)
      if (typeNames.contains(alias.toLowerCase)) None
      else {
        val d0 = dep(m.start)
        var i = m.start - 1
        var start = 0
        var done = false
        while (i >= 0 && !done) {
          if (dep(i) < d0) { start = i + 1; done = true }
          else if (dep(i) == d0 && sql(i) == ',') { start = i + 1; done = true }
          else if (dep(i) == d0 &&
              sql.regionMatches(true, i, "SELECT", 0, 6)) {
            start = i + 6; done = true
          }
          i -= 1
        }
        Some(alias -> sql.substring(start, m.start).trim)
      }
    }.toSeq
  }

  /** Select-list items of the last depth-0 SELECT (the one whose schema
    * the driver hashes).
    */
  private def finalSelectItems(sql: String): Seq[String] = {
    val dep = depths(sql)
    val sel = "(?i)\\bSELECT\\b".r.findAllMatchIn(sql)
      .filter(m => dep(m.start) == 0).toSeq.lastOption
    sel match {
      case None => Seq.empty
      case Some(m) =>
        val end = "(?i)\\bFROM\\b".r.findAllMatchIn(sql)
          .find(f => f.start > m.end && dep(f.start) == 0)
          .map(_.start).getOrElse(sql.length)
        val body = sql.substring(m.end, end)
        val items = scala.collection.mutable.ArrayBuffer.empty[String]
        val cur = new StringBuilder
        var d = 0
        body.foreach { ch =>
          if (ch == '(') d += 1 else if (ch == ')') d -= 1
          if (ch == ',' && d == 0) { items += cur.toString.trim; cur.clear() }
          else cur.append(ch)
        }
        if (cur.nonEmpty) items += cur.toString.trim
        items.toSeq
    }
  }

  /** Remove `OVER ( … )` clauses so the window spec's column names
    * don't leak into the double-context heuristics.
    */
  private def stripOver(expr: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < expr.length) {
      val m = "(?i)^OVER\\s*\\(".r.findFirstMatchIn(expr.substring(i))
      if (m.isDefined && (i == 0 || !expr(i - 1).isLetterOrDigit)) {
        var j = i + m.get.end
        var d = 1
        while (j < expr.length && d > 0) {
          if (expr(j) == '(') d += 1 else if (expr(j) == ')') d -= 1
          j += 1
        }
        i = j
      } else { sb.append(expr(i)); i += 1 }
    }
    sb.toString
  }

  /** True when `expr` is a SUM that DuckDB will type HUGEINT: no
    * enclosing CAST and nothing in the argument or the surrounding
    * arithmetic that coerces it to DOUBLE.
    */
  private def uncastIntegerSum(expr: String): Boolean = {
    val e = stripOver(expr)
    "(?i)\\bSUM\\s*\\(".r.findFirstMatchIn(e) match {
      case None => false
      case Some(m) =>
        val outerCast = "(?i)^\\s*CAST\\s*\\(".r.findFirstIn(e).isDefined &&
          "(?i)\\bAS\\s+\\w+\\s*\\)\\s*$".r.findFirstIn(e).isDefined
        if (outerCast) false
        else {
          var j = m.end
          var d = 1
          while (j < e.length && d > 0) {
            if (e(j) == '(') d += 1 else if (e(j) == ')') d -= 1
            j += 1
          }
          val arg = e.substring(m.end, j - 1)
          val ctx = arg + " " + e.substring(0, m.start) + " " + e.substring(j)
          val doubleish =
            ("(?i)(/|\\b\\d+\\.\\d|\\bround\\s*\\(|\\bln\\s*\\(|\\bexp\\s*\\(" +
              "|\\bsqrt\\s*\\(|::DOUBLE|\\bAS\\s+DOUBLE)").r
              .findFirstIn(ctx).isDefined
          val sumsDoubleCol = doubleCols.exists(c =>
            ("(?i)\\b" + c + "\\b").r.findFirstIn(arg).isDefined)
          !doubleish && !sumsDoubleCol
        }
    }
  }

  private def violations(sql: String): Seq[(String, String)] = {
    val defs = aliasedExprs(sql)
    finalSelectItems(sql).flatMap { item =>
      "(?i)\\bAS\\s+(\\w+)\\s*$".r.findFirstMatchIn(item) match {
        case Some(m) =>
          val expr = item.substring(0, m.start).trim
          if (uncastIntegerSum(expr)) Some(m.group(1) -> expr) else None
        case None =>
          "^(?:\\w+\\.)?(\\w+)$".r.findFirstMatchIn(item.trim).flatMap { bm =>
            val col = bm.group(1)
            defs.find { case (a, e) =>
              a.equalsIgnoreCase(col) && uncastIntegerSum(e)
            }.map { case (_, e) => col -> e }
          }
      }
    }
  }

  test("no oracle surfaces an un-cast integer SUM (HUGEINT→float64 class)") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        violations(sql).map { case (col, expr) =>
          s"$name.$col <- ${expr.replace('\n', ' ').take(90)}"
        }
    }
    assert(bad.isEmpty,
      "DuckDB types these as HUGEINT (pandas float64) while Spark emits " +
        "integers — wrap in CAST(... AS BIGINT):\n" + bad.mkString("\n"))
  }

  test("lint self-check: catches the r10/r11 red-row signatures") {
    // the two shapes that actually shipped red
    val t15Style = "WITH c AS (SELECT g, COUNT(*) AS cnt FROM t GROUP BY 1)" +
      " SELECT g, SUM(cnt) AS n FROM c GROUP BY 1"
    val c15Style = "WITH w AS (SELECT d, n_toks FROM t), r AS (SELECT d," +
      " SUM(n_toks) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum" +
      " FROM w) SELECT d, cum FROM r"
    assert(violations(t15Style).nonEmpty, "t15 shape must be flagged")
    assert(violations(c15Style).nonEmpty, "c15 shape must be flagged")
    // and the cast fix clears both
    val fixed = c15Style.replace("SUM(n_toks) OVER (ORDER BY d ROWS " +
      "UNBOUNDED PRECEDING)", "CAST(SUM(n_toks) OVER (ORDER BY d ROWS " +
      "UNBOUNDED PRECEDING) AS BIGINT)")
    assert(violations(fixed).isEmpty, "CAST must clear the flag")
  }
}
