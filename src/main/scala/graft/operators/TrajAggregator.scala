package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One observation of one entity (typed path input). */
final case class TypedObs(k: String, ts: Timestamp, v: Double)

/** Typed Dataset-idiomatic trajectory assembly (SURVEY.md §2.9): an
  * `Aggregator` folding per-entity observations into a time-sorted
  * instant sequence — the strongly-typed dual of
  * `Trajectory.pivot`'s `sort_array(collect_list(struct))`.
  *
  * Buffer is an unsorted Seq (cheap merge-by-concat, partial-aggregation
  * friendly); the single sort happens once in finish. Instants are kept
  * as epoch-µs longs inside the buffer so the buffer encoder stays a flat
  * product. Use as:
  * {{{
  *   ds.groupByKey(_.k).agg(TrajAggregator.toColumn)
  * }}}
  */
object TrajAggregator extends Aggregator[TypedObs, Seq[(Long, Double)], Seq[(Timestamp, Double)]] {

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(b: Seq[(Long, Double)], o: TypedObs): Seq[(Long, Double)] =
    b :+ ((o.ts.getTime * 1000L + (o.ts.getNanos / 1000) % 1000, o.v))

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    a ++ b

  override def finish(b: Seq[(Long, Double)]): Seq[(Timestamp, Double)] =
    b.sorted.map { case (us, v) =>
      val t = new Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      (t, v)
    }

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Timestamp, Double)]] = ExpressionEncoder()

  /** The agg as a TypedColumn for `groupByKey(...).agg(...)`. */
  def column: TypedColumn[TypedObs, Seq[(Timestamp, Double)]] = toColumn.name("traj")
}
