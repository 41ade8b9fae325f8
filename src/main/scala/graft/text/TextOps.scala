package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over
  * the `documents` table: token counting, quality scoring, language-ID
  * (n-gram/marker heuristic), fingerprinting, and 32-bit SimHash.
  *
  * Every operator is pure narrow column algebra (no UDFs, no shuffle except
  * the SimHash token aggregation) — embarrassingly parallel over document
  * partitions at any scale. Each ships with a DuckDB oracle twin
  * (the *Sql vals) built from the same arithmetic so results are
  * bit-identical cross-engine:
  *  - counts are integers (exact);
  *  - ratios are single IEEE divisions of integers (deterministic);
  *  - hashes are md5 hex strings (lexicographic min is engine-agnostic).
  */
object TextOps extends TextHtml
