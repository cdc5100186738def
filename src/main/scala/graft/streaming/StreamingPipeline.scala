package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.util.TimeCols

/** Structured Streaming face of the engine (SURVEY §2.10): the reference's
  * micro-batch pull CDC expressed as `readStream` → transforms → `writeStream`
  * with checkpoint-carried offsets — the checkpoint replaces the S3 JSON
  * watermark, `Trigger.AvailableNow` replaces the bounded "session".
  */
object StreamingPipeline {

  /** Run a bounded streaming pass over an events directory: hourly windowed
    * counts + value sums per event_type, exactly-once via checkpoint.
    * Returns the final aggregation state as a batch DataFrame.
    *
    * Sink is UPDATE-mode `foreachBatch` → COMPACTED distributed parquet
    * state: each micro-batch folds the groups whose aggregate changed into
    * the previous batch's state snapshot and overwrites `batch=<id>` with the
    * full current state (changed rows replace, unchanged rows carry over via
    * anti-join). Reading the final result is then a plain scan of the single
    * latest committed snapshot — no window dedup, no shuffle — while the
    * driver never materializes the aggregate and the streaming state store
    * stays bounded by the watermark: the 100-TB-safe shape without the
    * read-side cost. Crash recovery is idempotent: a replayed batch finds its
    * own committed `batch=<id>` dir and skips (the snapshot is already
    * applied); a partially-written dir has no _SUCCESS marker and is
    * invisible, so the replay simply overwrites it.
    *
    * The events fixture carries naive (NTZ) wall-clock timestamps; they
    * become absolute instants at ingest (UTC convention, tz-independent).
    *
    * `statePartitions` sizes the aggregation's state-store count. Streaming
    * state partitioning should match STATE cardinality (in-watermark windows ×
    * event types — a few thousand groups regardless of input volume), not the
    * input data size: map-side partial aggregation already parallelizes the
    * input at scan parallelism, while every extra state partition costs a
    * store instance + checkpoint commit PER MICRO-BATCH. Measured at sf0.1:
    * 32 partitions → 5.7s, 8 → 2.2s, identical results. Fixed at the query's
    * first start by the checkpoint; None inherits the session setting.
    */
  def hourlyEventRollup(spark: SparkSession, eventsPath: String,
                        checkpointDir: String, queryName: String,
                        statePartitions: Option[Int] = Some(8)): DataFrame = {
    val batchSchema = spark.read.parquet(eventsPath).schema
    val streamDir = streamSourceDir(eventsPath, checkpointDir)
    val stream = spark.readStream
      .schema(batchSchema)
      .parquet(streamDir)
      .withColumn("event_ts", TimeCols.utcTs("ts"))

    val agg = stream
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("n_events"),
        // exact decimal agg; final value emitted as double
        col("sum_value").cast("double").as("sum_value"))

    val sinkDir = s"${checkpointDir}_sink"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    try {
      val q = agg.writeStream
        .outputMode("update")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          compactStateSnapshot(batch, batchId, sinkDir,
            Seq("hour_start", "event_type"))
          ()
        }
        .queryName(queryName)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    // The latest committed snapshot IS the final aggregate state: one plain
    // scan, no dedup shuffle.
    latestSnapshotDir(spark, sinkDir) match {
      case Some(dir) => spark.read.parquet(dir)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], agg.schema)
    }
  }

  /** Fold one micro-batch's UPDATE-mode emissions into the previous full
    * state snapshot and commit the result as `sinkRoot/batch=<id>`: changed
    * groups replace (anti-join on `keys`), unchanged groups carry over.
    * Idempotent under crash-replay: a replayed batch sees its own committed
    * snapshot and skips; a half-written dir (no _SUCCESS) is ignored and
    * overwritten. Superseded snapshots are pruned after the commit. All data
    * movement is distributed — the driver only lists directory names. */
  private def compactStateSnapshot(batch: DataFrame, batchId: Long,
                                   sinkRoot: String, keys: Seq[String]): Unit = {
    val ss = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(sinkRoot)
    val fs = root.getFileSystem(ss.sparkContext.hadoopConfiguration)
    val myDir = new org.apache.hadoop.fs.Path(root, s"batch=$batchId")
    if (fs.exists(new org.apache.hadoop.fs.Path(myDir, "_SUCCESS"))) return
    val committed = committedSnapshots(fs, root).filter(_ < batchId)
    val newState = committed.maxOption match {
      case Some(prevId) =>
        val prev = ss.read.parquet(
          new org.apache.hadoop.fs.Path(root, s"batch=$prevId").toString)
        prev.join(batch, keys, "left_anti").unionByName(batch)
      case None => batch
    }
    newState.write.mode("overwrite").parquet(myDir.toString)
    committed.foreach(b =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"batch=$b"), true))
  }

  private def committedSnapshots(fs: org.apache.hadoop.fs.FileSystem,
                                 root: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("batch=") &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        n.stripPrefix("batch=").toLongOption
      else None
    }

  private def latestSnapshotDir(spark: SparkSession,
                                sinkRoot: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(sinkRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedSnapshots(fs, root).maxOption
      .map(b => new org.apache.hadoop.fs.Path(root, s"batch=$b").toString)
  }

  /** The file-stream source monitors DIRECTORIES. A single-file input (the
    * fixture layout) is staged as a symlink inside a scratch dir so the
    * stream still reads the original bytes in place.
    *
    * The scratch dir is DERIVED FROM THE CHECKPOINT, not a fresh temp dir:
    * the file-source offset log records absolute paths, so a re-run against
    * the same checkpoint must present the file under the SAME path or the
    * source treats it as brand new and re-ingests every row (doubling all
    * stateful aggregates/totals on recovery). The single-file staging is a
    * local-filesystem mechanism (symlinks) — matching the checkpoint, which
    * the caller supplies as a local path in this mode; directory inputs
    * (the production layout, any filesystem) bypass it entirely. */
  private def streamSourceDir(path: String, checkpointDir: String): String = {
    val f = new java.io.File(path)
    if (f.isFile) {
      val d = java.nio.file.Paths.get(checkpointDir + "_src")
      java.nio.file.Files.createDirectories(d)
      val link = d.resolve(f.getName)
      if (!java.nio.file.Files.exists(link,
          java.nio.file.LinkOption.NOFOLLOW_LINKS))
        java.nio.file.Files.createSymbolicLink(link, f.toPath)
      else if (!java.nio.file.Files.isSymbolicLink(link))
        // a stale REGULAR file/dir squatting on the link path: streaming
        // whatever it holds would silently diverge from the caller's input
        throw new IllegalStateException(
          s"staging entry $link exists but is not a symlink; remove the " +
            "stale entry or use a fresh checkpoint")
      else if (java.nio.file.Files.isSymbolicLink(link) && {
          // FILE identity, not path spelling: a resume via './', a relative
          // path, or a symlinked parent is the same file and must not be
          // refused; a deleted old target means the input really changed
          try !java.nio.file.Files.isSameFile(link, f.toPath)
          catch { case _: java.io.IOException => true }
        })
        // same filename, DIFFERENT file, same checkpoint: silently keeping
        // the old link would stream the OLD file's bytes; re-pointing it
        // would desync the offset log. Either way the caller's intent is
        // ambiguous — fail loudly.
        throw new IllegalStateException(
          s"checkpoint $checkpointDir already streams " +
            s"${java.nio.file.Files.readSymbolicLink(link)}; refusing to " +
            s"re-point its source at $path — use a fresh checkpoint")
      d.toString
    } else path
  }

  /** Streaming incremental load: staged parquet directory → warehouse
    * directory with EXACTLY-ONCE file tracking carried entirely by the
    * checkpoint (file-source offsets) and the parquet sink's _spark_metadata
    * commit log — the Structured Streaming replacement for the watermark
    * blacklist + sub-batch commit loop in [[graft.load.Loader]]. Each
    * `Trigger.AvailableNow` run drains whatever is newly staged and stops;
    * re-running with the same checkpoint never re-loads a file, even after a
    * mid-run crash (the sink's commit log makes partially-written batches
    * invisible to readers).
    */
  def streamingLoad(spark: SparkSession, stagingDir: String, targetDir: String,
                    checkpointDir: String): Unit = {
    val schema = spark.read.parquet(stagingDir).schema
    val q = spark.readStream
      .schema(schema)
      .parquet(stagingDir)
      .writeStream
      .format("parquet")
      .option("path", targetDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Read a streaming-load target through its _spark_metadata commit log
    * (only committed files are visible). */
  def readStreamingTarget(spark: SparkSession, targetDir: String) =
    spark.read.parquet(targetDir)

  /** Streaming materialized-view maintenance: fold each micro-batch of a
    * staged stream into a persisted [[graft.operators.Relational.foldAggregate]]
    * state, so the rollup the batch `post_ops` maintain stays fresh under
    * the streaming load path too. Exactly-once: `foreachBatch` can REPLAY a
    * batch after a crash (its checkpoint commits after the function
    * returns), so the folded batch id commits atomically WITH the state
    * ([[graft.util.AtomicDir.replace]]) and a replayed id is skipped — the
    * canonical idempotent-foreachBatch discipline. Returns the post-run
    * state. */
  def streamingFoldAggregate(spark: SparkSession, stagingDir: String,
                             statePath: String, checkpointDir: String,
                             keys: Seq[String],
                             sums: Seq[graft.operators.Relational.SumSpec])
      : DataFrame =
    streamingFold(spark, stagingDir, statePath, checkpointDir)(
      (prev, batch) =>
        graft.operators.Relational.foldAggregate(prev, batch, keys, sums))

  /** Streaming SCD2 history maintenance — same exactly-once foreachBatch
    * harness as [[streamingFoldAggregate]], folding each micro-batch into
    * the slowly-changing-dimension history
    * ([[graft.operators.Relational.scd2Apply]]). */
  def streamingScd2(spark: SparkSession, stagingDir: String,
                    statePath: String, checkpointDir: String,
                    keys: Seq[String], tsCol: String,
                    attrCols: Seq[String]): DataFrame =
    streamingFold(spark, stagingDir, statePath, checkpointDir)(
      (prev, batch) =>
        graft.operators.Relational.scd2Apply(prev, batch, keys, tsCol, attrCols))

  /** Streaming deterministic-sketch maintenance
    * ([[graft.operators.Sketches]]) on the same exactly-once harness.
    * Because these folds are EXACTLY merge-invariant (unlike the
    * error-bounded HLL/KLL folds), the streamed state is bit-identical to
    * a one-pass batch build no matter where micro-batch boundaries fall —
    * an assertable equality, which MultimodalStreamingSpec pins. */
  def streamingKmvDistinct(spark: SparkSession, stagingDir: String,
                           statePath: String, checkpointDir: String,
                           keys: Seq[String], valueCol: String,
                           k: Int = 256): DataFrame =
    streamingFold(spark, stagingDir, statePath, checkpointDir)(
      (prev, batch) =>
        graft.operators.Sketches.foldKmvDistinct(prev, batch, keys, valueCol, k))

  /** Streaming count-min maintenance — see [[streamingKmvDistinct]]. */
  def streamingCountMin(spark: SparkSession, stagingDir: String,
                        statePath: String, checkpointDir: String,
                        keys: Seq[String], itemCol: String): DataFrame =
    streamingFold(spark, stagingDir, statePath, checkpointDir)(
      (prev, batch) =>
        graft.operators.Sketches.foldCountMin(prev, batch, keys, itemCol))

  /** Streaming BM25 inverted-index maintenance — the retrieval analog of
    * [[streamingKmvDistinct]]: each micro-batch of NEW documents appends
    * its postings + doc-length rows into the persisted index state
    * (exactly-once via the folded-batch cursor), so keyword retrieval
    * stays fresh as the corpus streams in. Same new-docs-only contract as
    * the batch `fold_bm25` post-op; scoring the state with
    * [[graft.functions.CorpusFunctions.bm25FromIndex]] equals batch BM25
    * over the union of all batches (StreamingSpec-pinned via the fold's
    * chunk-invariance). */
  def streamingBm25Index(spark: SparkSession, stagingDir: String,
                         statePath: String, checkpointDir: String,
                         idCol: String, textCol: String): DataFrame =
    streamingFold(spark, stagingDir, statePath, checkpointDir)(
      (prev, batch) => graft.functions.CorpusFunctions.foldBm25Index(
        prev, batch, idCol, textCol))

  /** Streaming SimHash near-dup label maintenance — the streaming twin of
    * the `simhash_labels` post-op: each micro-batch of NEW documents is
    * probed against the persisted band index
    * ([[graft.functions.DedupFunctions.foldSimhashState]]), its pairs fold
    * into the incremental cluster labels, and its band rows append — index
    * and labels swap atomically as ONE discriminated state relation, so a
    * crash can never tear them apart (exactly-once via the folded-batch
    * cursor). Chained micro-batches label exactly like batch SimHash
    * clustering of everything streamed (pigeonhole exactness; spec-pinned). */
  def streamingSimhashLabels(spark: SparkSession, stagingDir: String,
                             statePath: String, checkpointDir: String,
                             idCol: String, textCol: String,
                             maxHamming: Int = 3): DataFrame =
    streamingFold(spark, stagingDir, statePath, checkpointDir)(
      (prev, batch) => graft.functions.DedupFunctions.foldSimhashState(
        prev, batch, idCol, textCol, maxHamming))

  /** Streaming PSI drift gate — the quality-gate analog of
    * [[streamingFoldAggregate]]: each micro-batch's categorical mix is
    * PSI-checked against the persisted corpus mix BEFORE folding
    * ([[graft.functions.CorpusFunctions.driftGateFold]]). A breach throws
    * inside foreachBatch → the streaming query FAILS and the folded-batch
    * cursor stays put, so a restart re-gates the same offending batch
    * (never silently folds it) — the exact contract of the batch
    * `drift_gate` post-op, carried onto the stream. */
  def streamingDriftGate(spark: SparkSession, stagingDir: String,
                         statePath: String, checkpointDir: String,
                         catCol: String, threshold: Double): DataFrame =
    streamingFold(spark, stagingDir, statePath, checkpointDir)(
      (prev, batch) => graft.functions.CorpusFunctions.driftGateFold(
        prev, batch, catCol, threshold, what = s"stream.$catCol"))

  /** Streaming annotation-reliability gate — [[streamingDriftGate]]'s
    * contract for label collection: each micro-batch's ratings must reach
    * `minAlpha` Krippendorff alpha BEFORE its report folds into the
    * cumulative audit state
    * ([[graft.functions.CorpusFunctions.reliabilityGateFold]]). A breach
    * throws inside foreachBatch → the query FAILS with the folded-batch
    * cursor unmoved, so a restart re-gates the same annotation batch. */
  def streamingReliabilityGate(spark: SparkSession, stagingDir: String,
                               statePath: String, checkpointDir: String,
                               itemCol: String, raterCol: String,
                               labelCol: String,
                               minAlpha: Double): DataFrame =
    streamingFold(spark, stagingDir, statePath, checkpointDir)(
      (prev, batch) => graft.functions.CorpusFunctions.reliabilityGateFold(
        prev, batch, itemCol, raterCol, labelCol, minAlpha,
        what = s"stream.$itemCol"))

  private def streamingFold(spark: SparkSession, stagingDir: String,
                            statePath: String, checkpointDir: String)(
      fold: (Option[DataFrame], DataFrame) => DataFrame): DataFrame = {
    import graft.util.AtomicDir
    val schema = spark.read.parquet(stagingDir).schema
    val q = spark.readStream
      .schema(schema)
      .parquet(streamSourceDir(stagingDir, checkpointDir))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        // single-writer context (foreachBatch worker): converge a crashed
        // swap before reading — readState is read-only, and the data read
        // below must see the restored live dir, not prev=None against an
        // advanced cursor
        locally {
          val sp = new org.apache.hadoop.fs.Path(statePath)
          AtomicDir.recoverSwap(
            sp.getFileSystem(spark.sparkContext.hadoopConfiguration),
            sp, new org.apache.hadoop.fs.Path(statePath + ".__old"))
        }
        val folded = AtomicDir.readState(spark, statePath)
          .flatMap("\"folded_batch\"\\s*:\\s*\"(-?\\d+)\"".r.findFirstMatchIn(_))
          .flatMap(_.group(1).toLongOption).getOrElse(-1L)
        if (batchId > folded) {
          val fs = new org.apache.hadoop.fs.Path(statePath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val prev =
            if (fs.exists(new org.apache.hadoop.fs.Path(statePath)))
              Some(spark.read.parquet(statePath))
            else None
          AtomicDir.replace(spark, statePath, fold(prev, batch),
            stateJson = Some(s"""{"folded_batch":"$batchId"}"""))
          ()
        } // replayed batch: already folded, skip (exactly-once)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(statePath)
  }

  /** Gap-based sessions via Spark's NATIVE `session_window` (works identically
    * in batch and streaming): session end = last event + gap, per the
    * operator's semantics (unlike [[sessionize]], whose end = last event).
    * Input `ts` is the fixture's naive (NTZ) timestamp. */
  def sessionWindows(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .withColumn("event_ts", TimeCols.utcTs("ts"))
      .groupBy(col("user_id"),
        session_window(col("event_ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"))

  /** Custom keyed state via `mapGroupsWithState`: cumulative per-user event
    * counts maintained in `GroupState` and carried ACROSS RUNS by the
    * checkpoint's state store — each `Trigger.AvailableNow` pass folds newly
    * staged events into the running totals (the streaming analog of the
    * watermark's cumulative row counters). Returns the post-run totals.
    * `statePartitions` sizes the state-store count to the KEY cardinality
    * (see [[hourlyEventRollup]]); None inherits the session setting. */
  def statefulUserCounts(spark: SparkSession, eventsDir: String,
                         checkpointDir: String, queryName: String,
                         statePartitions: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema)
      .parquet(streamSourceDir(eventsDir, checkpointDir))
      .select(col("user_id").cast("long"), col("event_id").cast("long"))
      .as[(Long, Long)]
    val counted = stream
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + events.size
          state.update(total)
          (user, total)
      }
    // foreachBatch sink: unlike the memory sink it SUPPORTS checkpoint
    // recovery, which is the whole point here. Update mode → each batch
    // surfaces the users whose state changed; each batch FOLDS its updates
    // into the previous full snapshot (same compacted-state protocol as the
    // hourly rollup), so the sink always holds the COMPLETE totals — a
    // crash-recovery run that replays zero batches still reads back every
    // user, and superseded snapshots are pruned as they're replaced. The
    // driver never materializes a single row.
    val sinkDir = s"${checkpointDir}_state/$queryName"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    try {
      val q = counted.writeStream
        .outputMode(OutputMode.Update())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, Long)], batchId: Long) =>
          compactStateSnapshot(batch.toDF("user_id", "total_events"), batchId,
            sinkDir, Seq("user_id"))
          ()
        }
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    latestSnapshotDir(spark, sinkDir) match {
      case Some(dir) => spark.read.parquet(dir)
      case None => spark.emptyDataset[(Long, Long)].toDF("user_id", "total_events")
    }
  }

  /** Streaming ingestion dedup: drop exact-duplicate documents AS THEY
    * ARRIVE, keyed on the content fingerprint in the state store, so
    * downstream stages only ever see novel content. Emits the distinct
    * fingerprint inventory — a set, hence deterministic regardless of
    * arrival/partition order (WHICH physical row of a duplicate group
    * survives is arrival-order-dependent; its fingerprint is not).
    *
    * State is one fingerprint key per distinct document — the irreducible cost
    * of EXACT global streaming dedup. When near-time dedup suffices, swap
    * in `dropDuplicatesWithinWatermark` to bound state by the watermark
    * horizon instead of corpus size. Appends ride the parquet sink's
    * _spark_metadata commit log → exactly-once across restarts.
    */
  def streamingDedupFingerprints(spark: SparkSession, docsPath: String,
                                 checkpointDir: String, queryName: String,
                                 statePartitions: Option[Int] = Some(8),
                                 textCol: String = "text"): DataFrame = {
    val batchSchema = spark.read.parquet(docsPath).schema
    val stream = spark.readStream
      .schema(batchSchema)
      .parquet(streamSourceDir(docsPath, checkpointDir))
      .select(graft.functions.TextFunctions.fingerprintMd5(col(textCol))
        .as("fingerprint"))
      .dropDuplicates("fingerprint")

    val sinkDir = s"${checkpointDir}_sink"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    try {
      val q = stream.writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", sinkDir)
        .option("checkpointLocation", checkpointDir)
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.read.parquet(sinkDir)
  }

  /** STREAM-STREAM event-time interval join: signups joined to the same
    * user's purchases within `horizonMinutes` — the attribution shape
    * (impression→click, signup→conversion). Both sides are real streams;
    * Spark buffers each side's in-horizon rows in the state store and the
    * time-bound join condition plus both watermarks let it EVICT state as
    * event time advances — without the interval bound the buffers grow
    * unboundedly, which is the scale failure this operator exists to avoid.
    * Append-mode parquet sink (inner stream-stream joins are append-only);
    * exactly-once across restarts via the sink's _spark_metadata log.
    * Over a bounded fixture the result equals the batch interval join —
    * hence oracle-checkable. Returns (signup_id, purchase_id, user_id,
    * lag_us).
    */
  def streamStreamAttribution(spark: SparkSession, eventsPath: String,
                              checkpointDir: String, queryName: String,
                              horizonMinutes: Int = 60,
                              statePartitions: Option[Int] = Some(8)): DataFrame = {
    val batchSchema = spark.read.parquet(eventsPath).schema
    val srcDir = streamSourceDir(eventsPath, checkpointDir)
    def side(kind: String, prefix: String) = spark.readStream
      .schema(batchSchema)
      .parquet(srcDir)
      .filter(col("event_type") === kind)
      .select(col("user_id").cast("long").as(s"${prefix}_user"),
        col("event_id").cast("long").as(s"${prefix}_id"),
        TimeCols.utcTs("ts").as(s"${prefix}_ts"))
      .withWatermark(s"${prefix}_ts", "1 hour")

    val joined = side("signup", "s").join(side("purchase", "p"),
      col("s_user") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("s_id").as("signup_id"), col("p_id").as("purchase_id"),
        col("s_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("s_ts"))).as("lag_us"))

    val sinkDir = s"${checkpointDir}_sink"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    try {
      val q = joined.writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", sinkDir)
        .option("checkpointLocation", checkpointDir)
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.read.parquet(sinkDir)
  }

  /** Stateful sessionization via mapGroupsWithState-style processing —
    * demonstrated with the batch-equivalent session-gap logic (events within
    * `gapMinutes` of each other belong to one session). Window-function form:
    * a session starts where the gap from the previous event exceeds the gap.
    * This is the scalable formulation (one shuffle on user_id) and is also the
    * standard SQL sessionization, so it is oracle-checkable — unlike opaque
    * state functions. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          (expr("timestampdiff(MICROSECOND, prev_ts, ts)") > gapUs)).cast("int"))
      .withColumn("session_seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }
}
