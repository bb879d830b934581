package graft

import java.sql.Timestamp

/** Hand-violation pins for the data-quality audit panel (`q37_dq_audit`):
  * every injected defect class is counted exactly once per offending row,
  * null keys violate both FK and PK checks, and the ppm rate is the exact
  * integer grid. The DuckDB gate owns cross-engine equality on the driver
  * fixture (which is clean — all-zero violations); this corpus makes every
  * check's violation path LIVE. */
class DqAuditSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = TempLayouts.tracked("graft-dq").toString
    // customer: ids 1..4, id 2 duplicated (2 rows in a >1 group), one
    // null PK row -> pk violations = 2 + 1 = 3 of 6 rows
    Seq(Some(1L), Some(2L), Some(2L), Some(3L), Some(4L), None)
      .toDF("c_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/customer.parquet")
    // orders: custkeys 1,2,99(orphan),null(violates FK — references
    // nothing) -> fk violations 2 of 4
    Seq((10L, Some(1L)), (11L, Some(2L)), (12L, Some(99L)),
      (13L, Option.empty[Long]))
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    // lineitem: orderkeys 10,10,77(orphan); quantities 1(ok), 50(ok,
    // inclusive), 51(range) -> fk 1 of 3, qty 1 of 3
    Seq((10L, 1.0), (10L, 50.0), (77L, 51.0))
      .toDF("l_orderkey", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    // part: one zero price (violates: <= 0), one null, one positive
    // -> 2 of 3
    Seq(Some(0.0), None, Some(9.99)).toDF("p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    // events: 1 null ts of 2
    Seq((1L, Some(Timestamp.valueOf("2024-03-01 10:00:00"))),
      (2L, Option.empty[Timestamp]))
      .toDF("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private lazy val panel =
    graft.queries.Relational.queries("q37_dq_audit")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

  test("every injected defect class is counted exactly, nulls included") {
    assert(panel("orders_fk_customer") === ((2L, 4L, 500000L)))
    assert(panel("lineitem_fk_orders") === ((1L, 3L, 333333L)))
    assert(panel("customer_pk_unique") === ((3L, 6L, 500000L)))
    assert(panel("part_price_positive") === ((2L, 3L, 666666L)))
    assert(panel("lineitem_qty_range") === ((1L, 3L, 333333L)))
    assert(panel("events_ts_present") === ((1L, 2L, 500000L)))
  }

  test("the driver fixture is clean: all six checks report zero " +
    "violations at sf0.001") {
    val clean = graft.queries.Relational
      .queries("q37_dq_audit")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(clean.length == 6)
    assert(clean.forall(r => r.getLong(1) == 0L && r.getLong(3) == 0L),
      "driver fixture unexpectedly carries violations: " +
        clean.filter(_.getLong(1) > 0).mkString(", "))
  }
}
