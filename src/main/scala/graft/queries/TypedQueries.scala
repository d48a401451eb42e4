package graft.queries

import graft.Tables
import graft.functions.TypedAggregators

/** Typed Dataset API queries: case-class rows, groupByKey, custom
  * `Aggregator` — the compile-time-checked face of the same engine.
  */
object TypedQueries {

  val queries: Seq[Q] = Seq(
    Q(
      "q33_typed_weighted_mean",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select($"l_returnflag", $"l_discount", $"l_extendedprice")
          .as[(String, Double, Double)]
          .groupByKey(_._1)
          .mapValues(r => TypedAggregators.WIn(r._2, r._3))
          .agg(TypedAggregators.WeightedMean.toColumn.name("wavg_discount"))
          .toDF("l_returnflag", "wavg_discount")
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT) * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                 / CAST(100.0 AS DOUBLE)
                 / CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS wavg_discount
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""),
      doc = "Typed Aggregator[IN,BUF,OUT]: revenue-weighted mean discount, cents-scaled exact accumulation.")
  )
}
