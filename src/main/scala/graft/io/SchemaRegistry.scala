package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.file.{Files, Paths}

/** Schema registry — replaces the Glue Crawler + Catalog (SURVEY S15/S16):
  * a named `StructType` store persisted as Spark-native schema JSON.
  *
  * `ensure` reproduces the reference's crawl-only-on-first-run branch
  * (slv_industry_code_daily/industry_code_daily.py:47-76, C2): infer once
  * from data, snapshot, and serve the snapshot from then on — schema
  * drift in later files cannot silently change downstream plans.
  */
final class SchemaRegistry(dir: String) {
  private def fileFor(name: String) = Paths.get(s"$dir/$name.schema.json")

  def contains(name: String): Boolean = Files.exists(fileFor(name))

  def put(name: String, schema: StructType): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(fileFor(name), schema.json)
  }

  def get(name: String): Option[StructType] =
    if (!contains(name)) None
    else Some(DataType.fromJson(Files.readString(fileFor(name))).asInstanceOf[StructType])

  /** Infer-once: returns the registered schema, inferring and registering
    * it from `inferFrom` (a json path) on first call only. */
  def ensure(spark: SparkSession, name: String, inferFrom: => String,
             multiLine: Boolean = false): StructType =
    get(name).getOrElse {
      val inferred = spark.read
        .option("multiLine", multiLine.toString)
        .json(inferFrom).schema
      put(name, inferred)
      inferred
    }
}
