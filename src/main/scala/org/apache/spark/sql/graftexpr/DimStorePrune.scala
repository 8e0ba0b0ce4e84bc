package org.apache.spark.sql.graftexpr

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: derive `__bucket` partition pruning from `__pk`
  * point-lookups over a graft dim store.
  *
  * The dim store (written by `graft.streaming.CdcRouter.mergeDim`, the
  * Spark-side replacement for the reference's Phoenix dim sink —
  * DimSinkFunction.java:26-81) is a parquet table hash-bucketed into
  * `__bucket=N/` partition dirs with the invariant
  *
  *   __bucket = pmod(hash(__pk), n)    // n persisted in `_bucket_count`
  *
  * A reader naturally filters on `__pk` (the lookup key), but Spark
  * cannot know the partition column is derived from it, so a point
  * lookup scans ALL n buckets. This rule recognizes a dim-store scan
  * (single-root relation partitioned by exactly `__bucket` whose root
  * carries the `_bucket_count` marker), evaluates the writer's own hash
  * expression over the literal key(s), and conjoins the implied
  * `__bucket` predicate — after which Spark's ordinary partition pruning
  * reads exactly one bucket per key. At 100 TB this is the difference
  * between a point lookup costing O(store/n) and O(store).
  *
  * Fires only on literal `=` / `IN` predicates with the key's exact
  * stored type (a cast around `__pk` means the stored bytes are not what
  * the user compared, so the rewrite stays out), and skips plans that
  * already constrain `__bucket` — which also makes it a fixpoint under
  * repeated application. Bucket counts are cached per table root: the
  * count is immutable for the life of a store (`mergeDim` validates it
  * on every write and demands a rebuild to change it).
  */
object DimStoreBucketPrune extends Rule[LogicalPlan] with PredicateHelper {
  /** Marker filename, shared by contract with `CdcRouter.BucketMarker`
    * (underscore prefix keeps it out of Spark's parquet file listing).
    */
  private val BucketMarker = "_bucket_count"

  /** root path → bucket count; -1 caches "not a dim store". */
  private val counts = new ConcurrentHashMap[String, Integer]()

  private def bucketCount(rel: HadoopFsRelation): Option[Int] = {
    val roots = rel.location.rootPaths
    if (roots.length != 1) return None
    val key = roots.head.toString
    val cached = counts.get(key)
    if (cached != null) return Some(cached.intValue).filter(_ > 0)
    val n: Integer = try {
      val fs = roots.head.getFileSystem(
        rel.sparkSession.sessionState.newHadoopConf())
      val marker = new Path(roots.head, BucketMarker)
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        txt.toIntOption.filter(_ > 0).map(Integer.valueOf).getOrElse(-1)
      } else Integer.valueOf(-1)
    } catch { case _: java.io.IOException => Integer.valueOf(-1) }
    counts.putIfAbsent(key, n)
    Some(n.intValue).filter(_ > 0)
  }

  private def isDimStoreScan(l: LogicalRelation): Boolean = l.relation match {
    case rel: HadoopFsRelation =>
      rel.partitionSchema.fieldNames.sameElements(Array("__bucket")) &&
        l.output.exists(_.name == "__pk")
    case _ => false // non-file relation: never a dim store
  }

  /** The writer's routing function, evaluated on a literal key:
    * `pmod(hash(k), n)` with Spark's `functions.hash` (Murmur3, seed 42).
    */
  private def bucketOf(key: Literal, n: Int): Int =
    Pmod(new Murmur3Hash(Seq(key)), Literal(n, IntegerType))
      .eval(EmptyRow).asInstanceOf[Int]

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, l: LogicalRelation)
        if isDimStoreScan(l) &&
          !cond.references.exists(_.name == "__bucket") =>
      val pk = l.output.find(_.name == "__pk").get
      val keyLits: Option[Seq[Literal]] =
        splitConjunctivePredicates(cond).collectFirst {
          case EqualTo(a: AttributeReference, k: Literal)
              if a.semanticEquals(pk) => Seq(k)
          case EqualTo(k: Literal, a: AttributeReference)
              if a.semanticEquals(pk) => Seq(k)
          case In(a: AttributeReference, ks)
              if a.semanticEquals(pk) && ks.forall(_.isInstanceOf[Literal]) =>
            ks.map(_.asInstanceOf[Literal])
          case InSet(a: AttributeReference, ks) if a.semanticEquals(pk) =>
            ks.toSeq.map(Literal(_, a.dataType))
        }
      keyLits.filter(ks => ks.nonEmpty && ks.forall(_.value != null))
        .flatMap(ks => bucketCount(l.relation.asInstanceOf[HadoopFsRelation])
          .map(n => (ks, n))) match {
        case Some((ks, n)) =>
          val bucket = l.output.find(_.name == "__bucket").get
          val ids = ks.map(bucketOf(_, n)).distinct.sorted
          val pruned =
            if (ids.size == 1) EqualTo(bucket, Literal(ids.head, IntegerType))
            else In(bucket, ids.map(Literal(_, IntegerType)))
          Filter(And(cond, pruned), l)
        case None => f
      }
  }
}
