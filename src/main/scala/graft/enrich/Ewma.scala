package graft.enrich

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exponentially-weighted moving average window function with pandas
  * `ewm(span=n, adjust=False)` recursion semantics (reference:
  * transform/enrichment.py:102-116 — ema/macd/atr all build on this):
  *
  *   ema_0 = x_0 ;  ema_t = alpha * x_t + (1 - alpha) * ema_{t-1}
  *
  * Null inputs do not update the state (pandas skips NaN with
  * `ignore_na=False` + adjust=False on an all-valid prefix; the first
  * non-null value seeds the recursion). The output is null until
  * `minPeriods` non-null values have been observed (pandas
  * `min_periods`).
  *
  * Implemented as a declarative aggregate window function over a
  * running [unboundedPreceding, currentRow] row frame, so Spark
  * evaluates it in O(1) incremental state per row — O(n) per
  * partition, no `collect_list` materialization. This is the
  * 100-TB-safe shape: one shuffle on the partition key, then a single
  * ordered pass per partition.
  */
case class EwmaWindowFunction(child: Expression, alpha: Double, minPeriods: Int)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ewma"

  private lazy val ema = AttributeReference("ema", DoubleType, nullable = true)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(ema, cnt)

  override val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType), Literal(0L))

  private def x: Expression = Cast(child, DoubleType)

  override val updateExpressions: Seq[Expression] = {
    val seeded = If(
      IsNull(ema),
      x,
      Add(
        Multiply(Literal(alpha), x),
        Multiply(Literal(1.0 - alpha), ema)))
    Seq(
      If(IsNull(x), ema, seeded),
      If(IsNull(x), cnt, Add(cnt, Literal(1L))))
  }

  override val evaluateExpression: Expression =
    If(GreaterThanOrEqual(cnt, Literal(math.max(minPeriods, 1).toLong)),
      ema, Literal(null, DoubleType))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object Ewma {
  /** pandas `ewm(span=span, adjust=False, min_periods=minPeriods)` over
    * an explicit (partitionBy, orderBy ascending) running window. The
    * WindowExpression is built directly in Catalyst because
    * `Column.over` does not wrap raw custom expressions.
    */
  def over(c: Column, span: Int, minPeriods: Int,
           partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = EwmaWindowFunction(
      ColumnBridge.expression(c), 2.0 / (span + 1.0), minPeriods)
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
