package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle twin producing identical column names,
  * types, and values (doubles pre-rounded on both sides so hash comparison
  * is stable). `headline` marks queries timed by Bench.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
