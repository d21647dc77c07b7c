package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.io.{Layout, PartitionLedger}
import graft.sources.Connector

/** C5 fan-out + C7 entry point: the reference's per-source task groups
  * (brz_industry_code_daily.py:28-38, brz_bonds_daily.py:35-43) as a map
  * over ingest jobs inside ONE Spark app — Spark schedules the stages;
  * no external orchestrator in the data path. Failure of one source
  * doesn't stop the rest (each job returns its own StageResult, as with
  * independent Airflow tasks). */
final class Runner(spark: SparkSession, layout: Layout, ledger: PartitionLedger) {

  def ingestAll(connectors: Seq[Connector], date: String,
                calendar: Option[org.apache.spark.sql.DataFrame] = None)
      : Map[String, StageResult] =
    connectors.map { c =>
      c.name -> new IngestJob(spark, layout, c, ledger, calendar).runFor(date)
    }.toMap
}
