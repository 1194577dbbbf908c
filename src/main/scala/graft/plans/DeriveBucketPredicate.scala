package graft.plans

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: for any Filter over a relation exposing graft's
  * hour-bucket partition column (`bucket: string`) plus the event-time
  * column (`ts: timestamp`), derive the bucket bounds implied by literal
  * ts predicates and conjoin them, so `PruneFileSourcePartitions` /
  * `FileSourceStrategy` can prune hour directories the caller's query
  * never has to name.
  *
  * This is the manual predicate of SnapshotStore.rangeScan as a
  * Rule[LogicalPlan]: a user filtering only on `ts` still gets partition
  * pruning. The rewrite is semantics-preserving (bucket(ts) bounds are a
  * superset of the ts bounds) and idempotent (skipped when any conjunct
  * already references `bucket`).
  *
  * Installed via `spark.experimental.extraOptimizations`
  * (SnapshotStore.installRules) — runs after the main optimizer batches,
  * which is still before physical planning where partition filters are
  * split from data filters.
  */
object DeriveBucketPredicate extends Rule[LogicalPlan] with PredicateHelper {

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd-HH").withZone(ZoneOffset.UTC)

  private def bucketOf(micros: Long): UTF8String =
    UTF8String.fromString(fmt.format(Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L))))

  private def isTs(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == "ts" && a.dataType == TimestampType
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      child.output.find(a => a.name == "bucket" && a.dataType == StringType) match {
        case Some(bucket) =>
          val conjuncts = splitConjunctivePredicates(cond)
          if (conjuncts.exists(_.references.contains(bucket))) f
          else {
            val derived: Seq[Expression] = conjuncts.flatMap {
              case GreaterThanOrEqual(t, Literal(v: Long, TimestampType)) if isTs(t) =>
                Some(GreaterThanOrEqual(bucket, Literal(bucketOf(v), StringType)))
              case GreaterThan(t, Literal(v: Long, TimestampType)) if isTs(t) =>
                Some(GreaterThanOrEqual(bucket, Literal(bucketOf(v), StringType)))
              case LessThan(t, Literal(v: Long, TimestampType)) if isTs(t) =>
                Some(LessThanOrEqual(bucket, Literal(bucketOf(v), StringType)))
              case LessThanOrEqual(t, Literal(v: Long, TimestampType)) if isTs(t) =>
                Some(LessThanOrEqual(bucket, Literal(bucketOf(v), StringType)))
              case EqualTo(t, Literal(v: Long, TimestampType)) if isTs(t) =>
                Some(EqualTo(bucket, Literal(bucketOf(v), StringType)))
              case EqualTo(Literal(v: Long, TimestampType), t) if isTs(t) =>
                Some(EqualTo(bucket, Literal(bucketOf(v), StringType)))
              case _ => None
            }
            if (derived.isEmpty) f
            else Filter(derived.foldLeft(cond)(And(_, _)), child)
          }
        case None => f
      }
  }
}

object GraftRules {
  /** Idempotently register graft's optimizer rules on a session. */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(DeriveBucketPredicate))
      spark.experimental.extraOptimizations = cur :+ DeriveBucketPredicate
  }
}
