package graft.queries

import graft.{QDef, QModule}
import graft.functions.WeightedAvg
import graft.multimodal.Multimodal

/** Typed-API and multimodal operators (SURVEY.md §2.10 object operators,
  * builder brief multimodal columns).
  */
object Extra extends QModule {

  /** groupByKey + typed Aggregator (MapGroups/ObjectHashAggregate path). */
  val qAggWeighted = QDef(
    "q_agg_weighted",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .as[(String, Double, Double)]
        .groupByKey(_._1)
        .agg(WeightedAvg.toColumn.name("wavg_price"))
        .toDF("l_returnflag", "wavg_price")
    },
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
          / CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS wavg_price
      FROM lineitem GROUP BY l_returnflag"""))

  /** Binary media columns + typed mapPartitions feature extraction. */
  val qMmFeatures = QDef(
    "q_mm_features",
    (s, d) => Multimodal.featuresQuery(s, d),
    Some(Multimodal.featuresOracleSql),
    bench = true)

  val defs: Seq[QDef] = Seq(qAggWeighted, qMmFeatures)
}
