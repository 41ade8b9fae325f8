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
  */
case class EventTimeExpr(child: Expression, ntz: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
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
