package graft.io

/** Path/layout conventions: `<root>/<layer>/<source>/ymd=<date>` mirroring
  * the reference's S3 key templates (yfinance_operator.py:16,
  * brz_kr_etf_daily/tasks.py:9-10; layers dags/common/constants.py:23-27).
  * Hive-style `ymd=` keys give partition discovery + pruning for free.
  */
final case class Layout(root: String) {
  val layers = Seq("landing", "bronze", "silver", "gold")

  def layer(name: String): String = {
    require(layers.contains(name), s"unknown layer: $name")
    s"$root/$name"
  }

  def source(layerName: String, sourceName: String): String =
    s"${layer(layerName)}/$sourceName"

  def partition(layerName: String, sourceName: String, ymd: String): String =
    s"${source(layerName, sourceName)}/ymd=$ymd"

  def yearPartition(layerName: String, sourceName: String, year: Int): String =
    s"${source(layerName, sourceName)}/year=$year"
}
