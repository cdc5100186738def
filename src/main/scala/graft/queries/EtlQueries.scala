package graft.queries

import org.apache.spark.sql.functions._
import graft.cdc._
import graft.extract.Extractor
import graft.load.Loader
import graft.model._
import graft.watermark.WatermarkStore

/** End-to-end pipeline query: Extractor → staged parquet → Loader → warehouse
  * read-back, checked against the source table itself (the driver's DuckDB
  * oracle never sees the intermediate hops, so a pass proves the full
  * extract→stage→load path preserves every row). */
object EtlQueries {

  val all: Seq[Q] = Seq(
    Q("q_e2e_extract_load",
      (s, dir) => {
        val scratch = Tables.scratchDir("e2e")
        val store = new WatermarkStore(s"$scratch/wm")
        val extractor = new Extractor(store, s"$scratch/staging")
        val loader = new Loader(store, s"$scratch/warehouse")
        val id = TableId("bench", "fixtures", "events")
        val cfg = CdcConfig(CdcStrategyKind.IdOnly, idColumn = Some("event_id"))
        val events = Tables.df(s, dir, "events")
        extractor.extract(s, id, events, cfg)
        loader.load(s, id, extractor.stagingDir(id), cfg)
        loader.readTarget(s, id).get
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), expr("ts DIV 1000").as("ts_us"))
      },
      Some("""SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
             |FROM events""".stripMargin))
  )
}
