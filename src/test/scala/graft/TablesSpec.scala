package graft

import org.apache.spark.sql.types._

/** Pins each Tables loader's post-load schema against the CURRENT
  * fixture files. The harness regenerates /root/testdata between rounds
  * and has already changed physical types once (events.ts
  * TIMESTAMP(NANOS) -> timestamp[us]; dates to timestamp[us]; prices to
  * double). Most queries survive such drift through tolerant casts —
  * this spec exists so the NEXT regen fails loudly in one place instead
  * of as a scatter of downstream query crashes.
  */
class TablesSpec extends SparkSpec {

  private def fieldTypes(name: String, df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  private val IntegralTypes: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)

  test("events loader normalizes ts to TimestampType regardless of fixture generation") {
    val e = Tables.events(spark, Sf)
    val t = fieldTypes("events", e)
    // the one loader with real normalization logic: whatever the file
    // holds (nanos-as-long or micros NTZ), downstream sees session-tz
    // TIMESTAMP so epoch functions (unix_micros, window) resolve
    assert(t("ts") == TimestampType, s"events.ts must load as TIMESTAMP, got ${t("ts")}")
    assert(t("event_id") == LongType && t("user_id") == LongType)
    assert(t("event_type") == StringType && t("props") == StringType)
    assert(t("value") == DoubleType)
    assert(e.limit(1).count() == 1, "events must be readable")
  }

  test("relational loaders expose the column names and numeric families queries assume") {
    val o = fieldTypes("orders", Tables.orders(spark, Sf))
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType)
    assert(o("o_orderstatus") == StringType && o("o_orderpriority") == StringType)
    // price arithmetic goes through explicit decimal casts, so any
    // numeric type is fine — but it must BE numeric
    assert(o("o_totalprice").isInstanceOf[NumericType], s"o_totalprice: ${o("o_totalprice")}")
    // date logic goes through to_date/date_format, so timestamp or date
    // both work — but a string here would silently change semantics
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType).contains(o("o_orderdate")),
      s"o_orderdate: ${o("o_orderdate")}")

    val l = fieldTypes("lineitem", Tables.lineitem(spark, Sf))
    assert(l("l_orderkey") == LongType && l("l_partkey") == LongType && l("l_suppkey") == LongType)
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      assert(l(c).isInstanceOf[NumericType], s"$c: ${l(c)}")
    assert(l("l_returnflag") == StringType && l("l_linestatus") == StringType)
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType).contains(l("l_shipdate")),
      s"l_shipdate: ${l("l_shipdate")}")

    val c = fieldTypes("customer", Tables.customer(spark, Sf))
    assert(c("c_custkey") == LongType && c("c_name") == StringType)
    assert(IntegralTypes.contains(c("c_nationkey")))
  }

  test("document and embedding loaders expose the text/vector shapes the LLM operators assume") {
    val d = fieldTypes("documents", Tables.documents(spark, Sf))
    assert(d("doc_id") == LongType && d("text") == StringType)
    assert(d("lang") == StringType && d("source") == StringType)
    assert(IntegralTypes.contains(d("n_chars")))

    val e = fieldTypes("embeddings", Tables.embeddings(spark, Sf))
    assert(e("vec_id") == LongType)
    assert(e("embedding") == ArrayType(FloatType, containsNull = true) ||
      e("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding: ${e("embedding")}")
    assert(IntegralTypes.contains(e("label")))
  }
}
