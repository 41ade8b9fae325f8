package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive event-time normalizer: whatever physical type the
  * `events.ts` parquet column arrives as, emit its value at microsecond
  * precision — as a plain long of µs-since-epoch (`ntz = false`) or as a
  * `TIMESTAMP_NTZ` (`ntz = true`).
  *
  * Why type dispatch lives in a Catalyst expression and not at a call
  * site: the driver's testdata has shipped `ts` both as parquet
  * `TIMESTAMP(NANOS)` (readable only as a long of nanos via
  * `spark.sql.legacy.parquet.nanosAsLong`) and as `timestamp[us]`
  * (read as `TIMESTAMP_NTZ`). A fixed-type conversion breaks at analysis
  * the moment the file flips (casting TIMESTAMP_NTZ to decimal is a
  * `DATATYPE_MISMATCH`); a dispatch on `df.schema` would have to be
  * threaded through every module that touches event time. This
  * expression instead resolves against the child's actual type:
  *
  *  - `LongType` (legacy nanos world): integer-exact floor-division by
  *    1000 (`Math.floorDiv` — identical to the former
  *    `floor(cast(decimal(38,0)) / 1000)` for every 64-bit nano count,
  *    including negatives, without the decimal detour).
  *  - `TIMESTAMP_NTZ` / `TIMESTAMP` (µs world): the internal Catalyst
  *    value IS already µs-since-epoch; pass it through bit-for-bit.
  *    No session-timezone interpretation happens in either direction.
  *
  * Both input and output representations are a primitive long, so the
  * whole thing stays inside whole-stage codegen (a single `floorDiv` or
  * a no-op per row). The DuckDB oracle's `CAST(ts AS TIMESTAMP)`
  * truncates ns→µs / no-ops on µs identically, so oracle parity is
  * preserved in both worlds.
  *
  * CONTRACT — UTC session timezone required for `TIMESTAMP` children:
  * a session-TZ `TIMESTAMP`'s internal value is UTC-µs, and this
  * expression reinterprets those bytes as NTZ wall-clock without any
  * zone conversion. That identity only holds when the session timezone
  * is UTC (the repo-wide pin in `build.sbt` / every SparkSession
  * builder); under any other zone event times would silently shift by
  * the zone offset. Rather than trust the pin, analysis FAILS for a
  * `TIMESTAMP` child when `spark.sql.session.timeZone` is not
  * UTC-equivalent — the misconfiguration surfaces as a
  * `DATATYPE_MISMATCH` at plan time, not as shifted hours in results.
  * `TIMESTAMP_NTZ` and long-of-nanos children are zone-free and carry
  * no such precondition.
  */
case class EventTimeExpr(child: Expression, ntz: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType if !EventTimeExpr.sessionTzIsUtc =>
      TypeCheckResult.TypeCheckFailure(
        s"${prettyName} reinterprets session-TZ TIMESTAMP bytes as NTZ wall-clock, " +
          s"which is only sound under a UTC session timezone; " +
          s"spark.sql.session.timeZone is " +
          s"'${org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone}'")
    case LongType | TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects a long of nanos or a timestamp, got $t")
  }

  override def dataType: DataType = if (ntz) TimestampNTZType else LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = if (ntz) "graft_event_ntz" else "graft_event_micros"

  private def fromNanos: Boolean = child.dataType == LongType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    if (fromNanos) Math.floorDiv(v, 1000L) else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (fromNanos) defineCodeGen(ctx, ev, c => s"java.lang.Math.floorDiv($c, 1000L)")
    else defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EventTimeExpr {
  /** True iff the session timezone resolves to fixed UTC (offset zero):
    * "UTC", "Etc/UTC", "GMT", "Z", "+00:00" all normalize to
    * `ZoneOffset.UTC`; any zone with DST or a nonzero offset does not.
    */
  private[functions] def sessionTzIsUtc: Boolean =
    try {
      java.time.ZoneId
        .of(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        .normalized() == java.time.ZoneOffset.UTC
    } catch { case _: java.time.DateTimeException => false }
}
