package graft

import graft.catalog.Catalog
import graft.operators.{CdcRouter, Scd2}
import graft.sources.Feeds
import org.apache.spark.sql.functions._

/** Catalog-as-data: schemas round-trip through the dictionary, and the
  * dictionary itself is SCD2-maintainable like any other table.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("schemaFor rebuilds each feed reader schema from catalog rows") {
    assert(Catalog.schemaFor(1) == Feeds.CsvTicketSchema)
    assert(
      Catalog.schemaFor(2) ==
        Feeds.JsonInteractionSchema("value").dataType
    )
    assert(Catalog.schemaFor(3) == Feeds.XmlRecordSchema)
  }

  test("dictionary is a queryable frame with one row per declared field") {
    val d = Catalog.dictionary(spark)
    val expected = Seq(
      Feeds.CsvTicketSchema.size,
      Feeds.JsonInteractionSchema("value").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].size,
      Feeds.XmlRecordSchema.size
    ).sum
    assert(d.count() == expected)
    // every source's ordinals are dense from 0
    val spans = d.groupBy("source_id")
      .agg(min("ordinal").as("lo"), max("ordinal").as("hi"), count(lit(1)).as("n"))
      .as[(Int, Int, Int, Long)].collect()
    spans.foreach { case (_, lo, hi, n) => assert(lo == 0 && hi == n - 1) }
  }

  test("dictionary rows are SCD2-maintainable (a type change versions the field)") {
    val key = "field_key"
    val snapshot = Catalog
      .dictionary(spark)
      .withColumn(key, concat(col("source_id"), lit(":"), col("field_name")))
      .withColumn(Scd2.ActiveFlag, lit(1))
      .withColumn(Scd2.StartDate, lit("2024-01-01 00:00:00"))
      .withColumn(Scd2.EndDate, lit("2099-12-31 00:00:00"))
    // an incoming catalog increment retypes one CSV field
    val routed = Catalog
      .dictionary(spark)
      .withColumn(key, concat(col("source_id"), lit(":"), col("field_name")))
      .where(col(key) === "1:RATING")
      .withColumn("data_type", lit("INTEGER"))
      .withColumn(CdcRouter.RouterCol, lit(CdcRouter.Update))
    val merged = Scd2.merge(
      snapshot, routed, key,
      loadTs = lit("2024-06-01 00:00:00"), endOfTime = lit("2099-12-31 00:00:00"))
    val versions = merged
      .where(col(key) === "1:RATING")
      .select("data_type", Scd2.ActiveFlag)
      .as[(String, Int)].collect().toSet
    assert(versions == Set(("STRING", 0), ("INTEGER", 1)))
    // every other field: exactly one active row, untouched
    val actives = merged.where(col(Scd2.ActiveFlag) === 1).count()
    assert(actives == Catalog.entries.size)
  }
}
