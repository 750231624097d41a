package graft.optimizer

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Stats-informed exact-distinct planning (SURVEY §4.3a; VERDICT r10
  * Next #6): rewrites an integer-keyed `COUNT(DISTINCT k)` aggregate into
  * the OR-combinable bitmap form
  *
  * {{{
  *   Aggregate(g, count(distinct k), child)
  *     ==>
  *   Aggregate(g, coalesce(sum(bitmap_count(b)), 0),
  *     Aggregate(g :+ bitmap_bucket_number(k),
  *       bitmap_construct_agg(bitmap_bit_position(k)) AS b, child))
  * }}}
  *
  * Why: Spark's stock single-distinct plan shuffles every distinct
  * `(group, k)` PAIR (two-phase aggregate keyed on both) — at a
  * near-unique key grain that is a corpus-sized shuffle, where the
  * bitmap form shuffles fixed-size 4 KB-bucket bitmaps per
  * `(group, bucket)` and stays map-side combinable (the q_agg_bitmap /
  * q_agg_distinct_bitmap twins measure this; exactness over the FULL
  * integral range including negatives is asserted in
  * `BitmapDistinctSpec`). Non-distinct companions (COUNT / integral SUM /
  * MIN / MAX) merge through the same two-level shape, so the rewrite
  * handles the common "distinct + counters" aggregate whole.
  *
  * When (the STATS gate, `spark.graft.bitmapDistinct` = off|auto|force,
  * default auto):
  *   - with CBO column stats (ANALYZE … FOR COLUMNS + spark.sql.cbo
  *     .enabled), fire iff ndv(k) ≥ `ndvRatio` (default 0.5) × rowCount —
  *     the near-unique-grain regime where the pair shuffle ≈ the corpus;
  *   - without stats, fall back to input size: fire iff the child's
  *     estimated bytes ≥ `minBytes` (default 1 GiB — small inputs keep
  *     the stock plan, at 100 TB the bitmap form always engages).
  *
  * Legality fences (bail out, keep the stock plan): every grouping
  * expression an Attribute; exactly ONE distinct aggregate, a
  * single-argument COUNT over an integral type (bucket/position are
  * injective over the full Long range, so any integral key is exact);
  * no FILTER clauses; companions limited to COUNT / MIN / MAX / SUM of
  * integral inputs (SUM of double re-associates and SUM of decimal
  * widens per level — both would change results/types, so they fence).
  * Output attributes keep their original exprIds, names, types, and
  * nullability, so parent plans never notice the switch.
  */
object BitmapDistinct extends Rule[LogicalPlan] {
  val ModeKey = "spark.graft.bitmapDistinct"
  val MinBytesKey = "spark.graft.bitmapDistinct.minBytes"
  val NdvRatioKey = "spark.graft.bitmapDistinct.ndvRatio"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mode = conf.getConfString(ModeKey, "auto")
    if (mode == "off") plan
    else plan.transformUp {
      case agg: Aggregate => maybeRewrite(agg, mode).getOrElse(agg)
    }
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The merge step of a two-level split for the supported companions. */
  private def mergeFn(fn: AggregateFunction, partial: Attribute): Option[Expression] =
    fn match {
      case _: Count => Some(Coalesce(Seq(aggExpr(Sum(partial)), Literal(0L))))
      case _: Min   => Some(aggExpr(Min(partial)))
      case _: Max   => Some(aggExpr(Max(partial)))
      case s: Sum if isIntegral(s.child.dataType) => Some(aggExpr(Sum(partial)))
      case _ => None
    }

  private def supportedCompanion(fn: AggregateFunction): Boolean = fn match {
    case _: Count | _: Min | _: Max => true
    case s: Sum => isIntegral(s.child.dataType)
    case _ => false
  }

  private def aggExpr(fn: AggregateFunction): AggregateExpression =
    AggregateExpression(fn, Complete, isDistinct = false, None,
      NamedExpression.newExprId)

  private def maybeRewrite(agg: Aggregate, mode: String): Option[Aggregate] = {
    val groupAttrs = agg.groupingExpressions
    if (!groupAttrs.forall(_.isInstanceOf[Attribute])) return None

    // classify the aggregate list: grouping passthroughs, ONE eligible
    // distinct count, mergeable companions — anything else bails
    var distinctSlot: Option[(Alias, Expression)] = None
    val companions = scala.collection.mutable.ArrayBuffer.empty[(Alias, AggregateExpression)]
    agg.aggregateExpressions.foreach {
      case a: Attribute if groupAttrs.exists(_.semanticEquals(a)) => ()
      case al @ Alias(ae: AggregateExpression, _) if ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(k)) if ae.isDistinct && isIntegral(k.dataType) =>
            if (distinctSlot.isDefined) return None // one distinct only
            distinctSlot = Some((al, k))
          case fn if !ae.isDistinct && supportedCompanion(fn) =>
            companions += ((al, ae))
          case _ => return None
        }
      // constant padding (e.g. MultiDistinctSplit's typed-null slots,
      // possibly collapsed into the Aggregate by CollapseProject) rides
      // through the outer aggregate untouched
      case Alias(e, _) if e.foldable => ()
      case _ => return None
    }
    val (distinctAlias, key) = distinctSlot.getOrElse(return None)

    // ---- the stats gate -------------------------------------------------
    val fire = mode == "force" || {
      val st = agg.child.stats
      val ndv = key match {
        case a: Attribute => st.attributeStats.get(a).flatMap(_.distinctCount)
        case _ => None
      }
      (st.rowCount, ndv) match {
        case (Some(rows), Some(d)) if rows > 0 =>
          val ratio = conf.getConfString(NdvRatioKey, "0.5").toDouble
          BigDecimal(d) >= BigDecimal(rows) * ratio
        case _ =>
          st.sizeInBytes >= BigInt(
            conf.getConfString(MinBytesKey, (1L << 30).toString).toLong)
      }
    }
    if (!fire) return None

    // ---- the rewrite ----------------------------------------------------
    val kLong =
      if (key.dataType == LongType) key else Cast(key, LongType)
    // bucket/position/count ship as RuntimeReplaceable, and the
    // ReplaceExpressions rule already ran (Finish Analysis) — splice
    // their replacements directly
    val bucket = new BitmapBucketNumber(kLong).replacement
    val bmAlias = Alias(
      aggExpr(BitmapConstructAgg(new BitmapBitPosition(kLong).replacement)),
      "_bm_bits")()
    val partials = companions.map { case (al, ae) =>
      al -> Alias(aggExpr(ae.aggregateFunction), s"_bm_p_${al.name}")()
    }.toMap

    val inner = Aggregate(
      groupAttrs :+ bucket,
      groupAttrs.map(_.asInstanceOf[Attribute]) ++
        (bmAlias +: partials.values.toSeq),
      agg.child)

    val outerAggs = agg.aggregateExpressions.map {
      case a: Attribute => a
      case al @ Alias(_, name) if al eq distinctAlias =>
        Alias(
          Coalesce(Seq(
            aggExpr(Sum(new BitmapCount(bmAlias.toAttribute).replacement)),
            Literal(0L))),
          name)(exprId = al.exprId, qualifier = al.qualifier)
      case al @ Alias(ae: AggregateExpression, name) =>
        val merged = mergeFn(ae.aggregateFunction, partials(al).toAttribute)
          .getOrElse(return None) // unreachable — classified above
        Alias(merged, name)(exprId = al.exprId, qualifier = al.qualifier)
      case al @ Alias(e, _) if e.foldable => al // constant padding
      case _ => return None // unreachable — classified above
    }
    Some(Aggregate(groupAttrs, outerAggs, inner))
  }
}
