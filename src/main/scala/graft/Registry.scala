package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered query: the Spark implementation and (when the semantics
  * are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL the driver
  * hash-compares against. Queries without an oracle get a rows-only check.
  *
  * Cross-engine determinism rules applied to every oracle-checked query:
  *  - aggregated doubles go through Cols.detSum/detAvg (decimal-exact,
  *    partition-order independent) and the oracle mirrors the same
  *    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) shape;
  *  - timestamps are emitted as TIMESTAMP_NTZ (microseconds) on the Spark
  *    side — DuckDB's naive TIMESTAMP matches bit-for-bit under the UTC
  *    session pin;
  *  - computed integers are cast to the same width on both sides;
  *  - every query ends in an ORDER BY over non-null keys (Spark sorts
  *    nulls first on ASC, DuckDB last — non-null keys sidestep it);
  *  - per-row double arithmetic (IEEE 754) is identical in both engines
  *    given identical inputs, so derived columns need no rounding.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])


/** The query registry: every driver-checked query, one `Q` per operator,
  * split by family into the graft/registry traits (RegistryBase carries
  * the shared oracle-SQL bodies and memoized seed state).
  */
object Registry
    extends ReferenceQueries
    with RelationalQueries
    with LlmQueries
    with DynamicQueries
    with CoverageQueries {

  def all: Seq[Q] = reference ++ relational ++ llm ++ dynamic ++ coverage
}
