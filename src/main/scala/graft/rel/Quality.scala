package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (the Deequ / Great-Expectations
  * pattern): a rule set is compiled into ONE aggregation pass over the
  * table — each rule contributes a violation-count aggregate, so a
  * 100 TB scan costs the same whether it carries one check or fifty —
  * and the result unpivots into a per-rule report row
  * (rule, n_violations, pass). Uniqueness rules add the only
  * grouped work (an exact distinct on the key), which is the same
  * hash-aggregate any dedup already pays.
  */
object Quality {

  sealed trait Rule { def name: String }
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
  }
  final case class Unique(column: String) extends Rule {
    val name = s"unique($column)"
  }
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($column, $lo, $hi)"
  }
  final case class InSet(column: String, allowed: Seq[String]) extends Rule {
    val name = s"in_set($column)"
  }
  final case class Matches(column: String, regex: String) extends Rule {
    val name = s"matches($column)"
  }

  private def violations(r: Rule): Column = r match {
    case NotNull(c) => count(when(col(c).isNull, 1))
    case Unique(c) => count(col(c)) - countDistinct(col(c))
    case InRange(c, lo, hi) =>
      count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1))
    case InSet(c, allowed) =>
      count(when(col(c).isNotNull && !col(c).isInCollection(allowed), 1))
    case Matches(c, re) =>
      count(when(col(c).isNotNull && !col(c).rlike(re), 1))
  }

  /** One report row per rule: all violation counts come out of a single
    * aggregation over `df`.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      violations(r).cast("long").as(s"v$i")
    } :+ count(lit(1)).cast("long").as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"v$i").as("n_violations"),
        col("n_rows"), (col(s"v$i") === 0).as("pass"))
    }
    one.select(explode(array(stacked: _*)).as("r"))
      .select("r.*")
      .orderBy("rule")
  }

  /** The in-flight form of [[check]]: rules attached to a DataFrame via
    * `observe` (CollectMetrics), so violation counts are collected AS A
    * SIDE EFFECT of whatever action the pipeline was already running —
    * the 100 TB ingest write audits itself with zero extra scans.
    * Distinct-based rules (Unique) are not expressible as observed
    * metrics (Spark disallows distinct aggregates in CollectMetrics) —
    * run those through [[check]]'s dedicated pass instead. Read results
    * from the returned Observation after the first action completes.
    */
  def observed(df: DataFrame, rules: Seq[Rule]):
      (DataFrame, org.apache.spark.sql.Observation) = {
    require(!rules.exists(_.isInstanceOf[Unique]),
      "Unique rules need a distinct aggregate — unsupported in observe(); use check()")
    val obs = org.apache.spark.sql.Observation()
    val aggs = rules.map(r => violations(r).cast("long").as(r.name)) :+
      count(lit(1)).cast("long").as("n_rows")
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Write-audit-publish — the ingestion pattern quality gates exist
    * for (Iceberg/Delta "WAP"): the batch is written to a STAGING path,
    * the rule set runs against what was actually written (not what was
    * intended — serialization itself is under audit), and only a fully
    * passing batch swaps into the live path; a failing batch leaves the
    * live table byte-untouched and the staging dir behind for
    * inspection. Returns the per-rule report either way. The swap is a
    * same-filesystem rename here; a production table format makes it a
    * metadata commit — the sequencing contract is the point.
    */
  def writeAuditPublish(
      df: DataFrame, rules: Seq[Rule], path: String): (Boolean, DataFrame) = {
    val staging = path.stripSuffix("/") + "__staging"
    df.write.mode("overwrite").parquet(staging)
    val spark = df.sparkSession
    val written = spark.read.parquet(staging)
    val report = check(written, rules)
    val allPass = report.agg(min(col("pass"))).head.getBoolean(0)
    if (allPass) {
      val live = new java.io.File(path)
      val bak = new java.io.File(path + "__old")
      if (live.exists) require(live.renameTo(bak), s"could not stage $path aside")
      require(new java.io.File(staging).renameTo(live), s"could not activate $staging")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      if (bak.exists) rm(bak)
    }
    (allPass, report)
  }

  /** The registered gate over `events` — the checks its consumers
    * (hourly views, sessionization, exports) implicitly rely on.
    */
  def eventsReport(events: DataFrame): DataFrame =
    check(events, Seq(
      NotNull("event_id"),
      Unique("event_id"),
      NotNull("ts"),
      NotNull("user_id"),
      InRange("user_id", 0, 1e9),
      InSet("event_type", Seq("click", "view", "signup", "purchase", "error")),
      InRange("value", 0, 1e6),
      Matches("props", "^\\{.*\\}$")))

  val eventsReportSql: String = {
    val rows = Seq(
      ("in_range(user_id, 0.0, 1.0E9)",
        "COUNT(CASE WHEN user_id IS NOT NULL AND (user_id < 0 OR user_id > 1000000000) THEN 1 END)"),
      ("in_range(value, 0.0, 1000000.0)",
        "COUNT(CASE WHEN value IS NOT NULL AND (value < 0 OR value > 1000000) THEN 1 END)"),
      ("in_set(event_type)",
        "COUNT(CASE WHEN event_type IS NOT NULL AND event_type NOT IN ('click','view','signup','purchase','error') THEN 1 END)"),
      ("matches(props)",
        "COUNT(CASE WHEN props IS NOT NULL AND NOT regexp_matches(props, '^\\{.*\\}$') THEN 1 END)"),
      ("not_null(event_id)", "COUNT(CASE WHEN event_id IS NULL THEN 1 END)"),
      ("not_null(ts)", "COUNT(CASE WHEN ts IS NULL THEN 1 END)"),
      ("not_null(user_id)", "COUNT(CASE WHEN user_id IS NULL THEN 1 END)"),
      ("unique(event_id)", "COUNT(event_id) - COUNT(DISTINCT event_id)"))
    rows.map { case (name, expr) =>
      s"""SELECT '$name' AS rule, CAST($expr AS BIGINT) AS n_violations,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows, ($expr) = 0 AS pass
         |FROM events""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY rule")
  }
}
