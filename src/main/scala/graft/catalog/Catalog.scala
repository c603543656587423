package graft.catalog

import graft.sources.Feeds
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Catalog-as-data — the reference's CSD_DATA_DICTIONARY /
  * CSD_TABLE_NAMES / CSD_TABLE_COLUMNS tables
  * (Setup/SQL_DDL_Script.sql:76-133, Setup/SQL_DML_Script.sql:535-744)
  * re-expressed Spark-first:
  *
  *   - the dictionary CONTENT derives from the declared feed StructTypes
  *     (`sources.Feeds`) — one source of truth, no drift between the
  *     catalog rows and the schemas jobs actually read with;
  *   - it is exposed as an ordinary DataFrame (`dictionary(spark)`), so
  *     catalog queries are just queries and the catalog itself can be
  *     SCD2-maintained with `Scd2.merge` like any other table;
  *   - `schemaFor(sourceId)` rebuilds the reader StructType FROM catalog
  *     rows (SURVEY §1.3's "drive source schemas from the dictionary"),
  *     pinned round-trip-equal to the Feeds schemas by CatalogSpec.
  */
object Catalog {
  /** One dictionary row: a field of a source feed. */
  final case class DictField(
      source_id: Int,
      table_name: String,
      ordinal: Int,
      field_name: String,
      data_type: String,
      nullable_flag: Int
  )

  /** DDL-ish type names, bijective with the Spark types the feeds use. */
  def typeName(dt: DataType): String = dt match {
    case IntegerType => "INTEGER"
    case LongType    => "BIGINT"
    case DoubleType  => "DOUBLE"
    case StringType  => "STRING"
    case BooleanType => "BOOLEAN"
    case other       => throw new IllegalArgumentException(s"uncatalogued type: $other")
  }

  def dataTypeOf(name: String): DataType = name match {
    case "INTEGER" => IntegerType
    case "BIGINT"  => LongType
    case "DOUBLE"  => DoubleType
    case "STRING"  => StringType
    case "BOOLEAN" => BooleanType
    case other     => throw new IllegalArgumentException(s"uncatalogued type name: $other")
  }

  /** (source_id, logical table name, record schema) per feed. The JSON
    * source catalogs its VALUE record (the logical row), not the
    * key/value envelope.
    */
  val Sources: Seq[(Int, String, StructType)] = Seq(
    (1, "CSV_TICKETS", Feeds.CsvTicketSchema),
    (2, "JSON_INTERACTIONS",
      Feeds.JsonInteractionSchema("value").dataType.asInstanceOf[StructType]),
    (3, "XML_RECORDS", Feeds.XmlRecordSchema)
  )

  /** The full dictionary, derived from the declared schemas. */
  val entries: Seq[DictField] =
    Sources.flatMap { case (sid, table, schema) =>
      schema.fields.zipWithIndex.map { case (f, i) =>
        DictField(sid, table, i, f.name, typeName(f.dataType), if (f.nullable) 1 else 0)
      }
    }

  /** Dictionary as a DataFrame (CSD_DATA_DICTIONARY + CSD_TABLE_COLUMNS
    * twin). Tiny by construction — broadcast-join it against anything.
    */
  def dictionary(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF()
  }

  /** Rebuild a feed reader schema from catalog rows — the catalog drives
    * the source StructType, not the other way around.
    */
  def schemaFor(sourceId: Int): StructType =
    StructType(
      entries
        .filter(_.source_id == sourceId)
        .sortBy(_.ordinal)
        .map(e => StructField(e.field_name, dataTypeOf(e.data_type), e.nullable_flag == 1))
    )
}
