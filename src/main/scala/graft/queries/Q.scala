package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark program over the testdata tables
  * plus (when SQL-expressible) a semantically identical DuckDB oracle.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
