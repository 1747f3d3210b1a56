package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Maintenance for the persisted-index family ([[TextIndex]],
 * [[Similarity.buildIvfIndex]], [[DedupIndex]]): DELETE and COMPACT —
 * the two operations that let an index live for months of appends
 * instead of being rebuilt whenever the corpus shrinks or the file
 * count grows.
 *
 * == Delete (tombstones) ==
 *
 * `deleteFrom*Index(ids)` removes documents/vectors LOGICALLY: the ids
 * land in a `_tombstones/` sidecar (underscore — invisible to parquet
 * listings) that every probe anti-joins away (broadcast — a takedown
 * list is small), and the freshness stamp is updated SUBTRACTIVELY
 * (row count and `hash60(id)` sum are additive in both directions), so
 * after the delete the index verifies fresh against the post-delete
 * source and probes behave exactly as if the ids had never been
 * indexed. No data files are rewritten — a right-to-erasure pass over
 * a 100 TB index is a sidecar append plus a meta rewrite, not an
 * index-sized job. Physical removal happens at the next compaction.
 *
 * Contracts, fail-loud: every requested id must actually be indexed
 * (subtracting a never-indexed id would corrupt the stamp) and not
 * already tombstoned (a double delete would subtract twice). A
 * tombstoned id can NOT be re-appended until a compaction physically
 * purges it — its rows still exist, so the append guard's precise
 * verify refuses it (and a probe-side tombstone would otherwise
 * suppress the re-appended rows too).
 *
 * == Compact (staging + swap) ==
 *
 * Repeated appends leave ≥1 parquet file per touched partition
 * directory per batch — months of daily appends degrade listing and
 * scan cost even though pruning still works — and tombstones make
 * probes pay an anti-join. `compact*Index` rewrites the tree:
 * one pass re-reads the index MINUS tombstones, writes a fresh tree
 * (same layout, same within-partition sort, ~1 file per partition)
 * into a staging sibling `<path>.graft-compact-tmp`, carries `_meta` /
 * `_codebook` unchanged (deletes already adjusted the stamp), rebuilds
 * the [[IndexIds]] Bloom EXACTLY from the surviving ids (shedding
 * tombstoned ids and accumulated false-positive mass — read back from
 * the STAGED tree's id column, so the old tree is scanned exactly
 * once; `bloomResize` adopts new sizing at this natural resize point;
 * a text index holding token-free documents unions in the
 * `_tokenfree` sidecar's live ids — only a LEGACY tree without that
 * sidecar falls back to carrying the live Bloom verbatim, see
 * [[IndexIds.carryLive]]), drops `_tombstones`, then swaps:
 *
 *   rename(path -> path.graft-compact-old); rename(tmp -> path);
 *   delete(old)
 *
 * Probes are byte-identical before/after (the gates re-run their
 * oracles against a compacted tree). A crash between the two renames
 * leaves no live tree but both halves intact — the next compact (or
 * probe) of that path should call the recovery rename documented on
 * [[restoreAfterCrash]]; compact runs it automatically on entry. This
 * is also the recovery path for an append that crashed between its
 * data and meta writes: compact rebuilds sidecars from what actually
 * landed — EXCEPT the stamp, which intentionally stays whatever `_meta`
 * says (if the stamp is behind the data, rebuild; compact must never
 * bless a half-appended tree as fresh).
 */
object IndexMaintenance {

  private def fsOf(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tombstones(path: String) = s"$path/_tombstones"

  /** DATA files under `root` — underscore sidecars (`_meta`,
    * `_idbloom`, `_tombstones`), `_SUCCESS` markers and hidden files
    * excluded, wherever they sit in the tree. ONE recursive listing
    * call (a single RemoteIterator stream), not one RPC per partition
    * directory — a text index can have 2^16 bucket dirs. */
  private def dataFileCount(fs: org.apache.hadoop.fs.FileSystem,
                            root: String): Long = {
    // qualified BEFORE taking the URI path: a relative root would fail
    // to prefix-strip the fully-qualified listing paths, and ancestor
    // directory names would leak into the hidden-segment filter
    val rootPath = fs.makeQualified(new Path(root))
    if (!fs.exists(rootPath)) return 0L
    val rootUri = rootPath.toUri.getPath
    val it = fs.listFiles(rootPath, true)
    var n = 0L
    while (it.hasNext) {
      val rel = it.next().getPath.toUri.getPath
        .stripPrefix(rootUri).stripPrefix("/")
      if (!rel.split("/").exists(s => s.startsWith("_") || s.startsWith(".")))
        n += 1
    }
    n
  }

  /** Refuse to install a staged tree that holds NO data files — it
    * would throw "unable to infer schema" on every later read, turning
    * a still-working index (whose live files the probes anti-join
    * down to zero rows) into an unreadable one. Reached when every
    * DATA-bearing row is tombstoned (for a text index, token-free
    * documents may still be live in `_meta`/Bloom — they have no rows
    * to compact); the remedy is a rebuild from source, not a
    * compact. */
  private def requireStagedReadable(spark: SparkSession, op: String,
                                    path: String,
                                    stagedData: String): Unit =
    require(dataFileCount(fsOf(spark, stagedData), stagedData) > 0L,
      s"$op: every data-bearing row of $path is tombstoned — the " +
        "compacted tree would hold no data files and be unreadable. The " +
        "live tree still serves probes (tombstones filter everything); " +
        "rebuild the index from source instead of compacting. (A text " +
        "index may still count live token-free documents in _meta — a " +
        "rebuild from source preserves them; this refusal loses " +
        "nothing.)")

  /** Tombstone bytes past which probes stop BROADCASTING the sidecar:
    * repeated deletes accumulate until compaction, and a forced
    * broadcast of an overgrown set dies on the broadcast limit instead
    * of degrading. 64 MB of parquet'd ids (~tens of millions of
    * tombstones) is far past "takedown-sized" — at that point the
    * shuffle anti-join is the right plan anyway and compaction is
    * overdue ([[indexHealth]] says so). */
  private[ops] val TombstoneBroadcastBytes: Long = 64L << 20

  /** Bytes under which the tombstone sidecar is read DRIVER-DIRECT and
    * applied as a codegen'd set-membership FILTER instead of a join:
    * a probe against an index with a takedown-sized delete list paid a
    * Spark read job + a broadcast build job per probe for a few
    * thousand longs. 4 MB of parquet'd ids ≈ several hundred thousand
    * tombstones — far past takedown-sized, trivially driver-held. */
  private[ops] val TombstoneLocalBytes: Long = 4L << 20

  /** Probe-side tombstone filter. Takedown-sized sidecars (the common
    * case) are read once on the driver and become a `NOT IN <set>`
    * filter — no scan job, no broadcast, no join in the probe's plan;
    * mid-sized sets keep the broadcast anti-join, and sets past
    * `maxBroadcastBytes` fall back to the shuffle anti-join (the size
    * check is one namenode summary call, no data read). Zero cost when
    * no delete has ever run. NULL ids are kept on every path (an
    * anti-join never matches NULL — the filter preserves that). */
  private[graft] def minusTombstones(spark: SparkSession, indexPath: String,
                                     df: DataFrame, idCol: String,
                                     maxBroadcastBytes: Long =
                                       TombstoneBroadcastBytes,
                                     maxLocalBytes: Long =
                                       TombstoneLocalBytes): DataFrame = {
    val fs = fsOf(spark, indexPath)
    val p = new Path(tombstones(indexPath))
    if (!fs.exists(p)) df
    else {
      val bytes = fs.getContentSummary(p).getLength
      if (bytes <= maxLocalBytes) {
        val ids = graft.store.MetaIO.readRows(
            spark.sparkContext.hadoopConfiguration, tombstones(indexPath))
          .iterator.flatMap(m => Option(m("id")))
          .map(_.asInstanceOf[Long]).toSeq
        if (ids.isEmpty) df
        // coalesce(..., true): InSet(NULL) is NULL, and a bare NOT NULL
        // filter would drop null-id rows the anti-join keeps
        else df.filter(coalesce(!col(idCol).isInCollection(ids), lit(true)))
      } else {
        val ts = spark.read.parquet(tombstones(indexPath))
          .select(col("id").as(idCol))
        val side =
          if (bytes <= maxBroadcastBytes) broadcast(ts)
          else ts
        df.join(side, Seq(idCol), "left_anti")
      }
    }
  }

  /** One-row health report for any persisted index tree — the
    * "compaction overdue?" signal the delete path cannot raise itself
    * (deletes are sidecar appends; nothing ever fails until a probe
    * pays for the accumulation). Columns:
    * `n_tombstones` / `tombstone_bytes` (0 when no delete ever ran),
    * `n_files` (DATA files only — underscore sidecars, `_SUCCESS`
    * markers and hidden files excluded, so the number is a real
    * append-fragmentation proxy that deletes cannot inflate),
    * `bloom_ids` / `bloom_expected` / `bloom_fill` (id-sidecar fill;
    * fill > 1 means fpp has degraded past its design point; nulls when
    * no sidecar), and `compaction_overdue` — true when the tombstone
    * set has outgrown the probe broadcast valve or the Bloom is
    * overfull. Cost: namenode metadata plus one takedown-sized
    * tombstone count; the index data is never read. */
  def indexHealth(spark: SparkSession, path: String): DataFrame = {
    val fs = fsOf(spark, path)
    // a missing tree must not read as a healthy all-zero row — a
    // monitor watching a deleted or misspelled path would report it
    // fine forever
    require(fs.exists(new Path(path)),
      s"indexHealth: no index tree at $path")
    val tp = new Path(tombstones(path))
    val (nTomb, tombBytes) =
      if (!fs.exists(tp)) (0L, 0L)
      else (spark.read.parquet(tombstones(path)).count(),
        fs.getContentSummary(tp).getLength)
    val nFiles = dataFileCount(fs, path)
    // scalar sidecar stats only — never the Bloom binary (GBs at
    // billion-id scale; this runs from streaming maintenance hooks)
    val bloom = IndexIds.loadStats(spark, path)
    val fill = bloom.map(b => b.nIds.toDouble / b.expected.toDouble)
    val overdue = tombBytes > TombstoneBroadcastBytes ||
      fill.exists(_ > 1.0)
    import spark.implicits._
    Seq((nTomb, tombBytes, nFiles, bloom.map(_.nIds), bloom.map(_.expected),
        fill, overdue))
      .toDF("n_tombstones", "tombstone_bytes", "n_files", "bloom_ids",
        "bloom_expected", "bloom_fill", "compaction_overdue")
  }

  /** The index family at `path`, detected from the tree's own shape —
    * every family is self-describing by construction (`_coarse` only on
    * IVFPQ, `sigs/` only on dedup trees, `n_buckets` only in a text
    * `_meta`, and the two `_codebook` schemas differ in their key
    * columns). Fails loudly on anything unrecognized. */
  private[graft] def indexFamily(spark: SparkSession, path: String): String = {
    val fs = fsOf(spark, path)
    def has(p: String) = fs.exists(new Path(s"$path/$p"))
    val conf = spark.sparkContext.hadoopConfiguration
    if (has("_coarse")) "ivfpq"
    else if (has("sigs")) "dedup"
    else if (has("_meta") && graft.store.MetaIO.columnsOf(conf, s"$path/_meta")
      .exists(_.contains("n_buckets"))) "text"
    else if (has("_codebook")) {
      val cols = graft.store.MetaIO.columnsOf(conf, s"$path/_codebook")
        .getOrElse(throw new IllegalArgumentException(
          s"indexFamily: $path/_codebook is unreadable")).toSet
      if (cols.contains("s")) "pq"
      else if (cols.contains("centroid")) "ivf"
      else throw new IllegalArgumentException(
        s"indexFamily: $path/_codebook matches neither the PQ (s, j, " +
          "codeword) nor the IVF (j, centroid) schema")
    } else throw new IllegalArgumentException(
      s"indexFamily: $path is not a recognized graft index tree")
  }

  /** Close the maintenance loop [[indexHealth]] can only report on:
    * compact `path` iff its health has crossed a threshold — the
    * tombstone sidecar outgrew the probe broadcast valve
    * (`maxTombstoneBytes`, default the valve itself) or the id Bloom
    * overfilled (`maxBloomFill`, default 1.0 = design fill). Returns
    * true iff a compaction ran; a healthy index costs one health check
    * (namenode metadata + a takedown-sized count — cheap enough to
    * call from an ingest sink every N batches).
    *
    * When the BLOOM is what tripped and no explicit `bloomResize` was
    * given, compacting at the old sizing would restore nothing — the
    * sidecar is resized automatically to twice its live id count at
    * its existing fpp (never below the original `expected`). The
    * family is auto-detected ([[indexFamily]]). A legacy text tree
    * whose token-free ids exist only in the Bloom cannot resize; the
    * AUTO path detects that upfront (before any staged write) and —
    * when the fill trip was the only reason to compact — returns false
    * rather than rewrite the index every trip for no benefit
    * (indexHealth keeps reporting the overfill; rebuild is the
    * documented reset). An EXPLICIT `bloomResize` on such a tree still
    * fails loudly downstream. */
  def compactIfOverdue(spark: SparkSession, path: String,
                       bloomResize: Option[(Long, Double)] = None,
                       maxTombstoneBytes: Long = TombstoneBroadcastBytes,
                       maxBloomFill: Double = 1.0): Boolean = {
    val h = indexHealth(spark, path).head()
    val tombOver = h.getAs[Long]("tombstone_bytes") > maxTombstoneBytes
    val fillOver = Option(h.getAs[java.lang.Double]("bloom_fill"))
      .exists(_.doubleValue() > maxBloomFill)
    if (!tombOver && !fillOver) return false
    val autoResize = bloomResize.orElse {
      if (!fillOver) None
      else IndexIds.loadStats(spark, path).map { ib =>
        (math.max(2L * ib.nIds, ib.expected), ib.fpp) }
    }
    val family = indexFamily(spark, path)
    // An AUTO-derived resize on a pre-`_tokenfree` text tree that
    // indexes token-free docs is unsound (their ids exist only in the
    // Bloom; a resized rebuild would drop them) — and compactTextIndex
    // can only refuse it AFTER the staged write, an index-rewrite-sized
    // cost a maintenance hook would then pay on EVERY trip. Detect
    // upfront with the same arithmetic (one pruned id-column count,
    // only on this rare legacy path) and drop the resize; an explicit
    // caller-passed bloomResize still fails loudly downstream.
    val resize =
      if (family != "text" || autoResize.isEmpty || bloomResize.isDefined ||
          fsOf(spark, path).exists(
            new Path(TextIndex.tokenFreePath(path)))) autoResize
      else {
        val live = minusTombstones(spark, path,
          spark.read.parquet(path).select("id").distinct(), "id").count()
        if (TextIndex.loadMeta(spark, path).stamp.nRows <= live) autoResize
        else None
      }
    // the resize was dropped and the Bloom trip was the only reason to
    // be here: compacting cannot lower the fill (the sidecar carries
    // verbatim), so running it every trip would be a full-rewrite loop
    // with no benefit — leave the index alone; indexHealth keeps
    // reporting the overfill, and a rebuild is the documented reset
    if (!tombOver && resize.isEmpty) return false
    family match {
      case "text"  => compactTextIndex(spark, path, resize)
      case "ivf"   => compactIvfIndex(spark, path, resize)
      case "pq"    => compactPqIndex(spark, path, resize)
      case "ivfpq" => compactIvfPqIndex(spark, path, resize)
      case "dedup" => compactDedupIndex(spark, path, resize)
    }
    true
  }

  /** Normalize + validate a delete request: distinct non-null Long ids,
    * none already tombstoned, all present in `indexIds`. Returns the
    * validated id frame (cached) plus its count and hash-sum for the
    * subtractive stamp. */
  private def validatedDeleteIds(spark: SparkSession, indexPath: String,
                                 op: String, ids: DataFrame,
                                 indexIds: DataFrame): (DataFrame, Long,
                                                        java.math.BigDecimal) = {
    // materialized EAGERLY: the validated frame feeds four separate
    // jobs (already-tombstoned check, membership check, stamp
    // aggregation, tombstone write) — a non-deterministic `ids` input
    // (a sample, a limit) re-evaluated per job could tombstone a
    // different id set than was validated and stamped, permanently
    // corrupting the subtractive freshness stamp
    val del = ids.select(col(ids.columns.head).cast(LongType).as("id"))
      .filter(col("id").isNotNull).distinct()
      .localCheckpoint(true)
    val already = minusTombstones(spark, indexPath, del, "id")
    // ids already tombstoned = del minus (del minus tombstones)
    val dupTomb = del.join(already, Seq("id"), "left_anti").limit(1).collect()
    require(dupTomb.isEmpty,
      s"$op: id ${if (dupTomb.nonEmpty) dupTomb(0).getLong(0) else ""} is " +
        s"already deleted from $indexPath — a second delete would subtract " +
        "its stamp twice")
    val missing = del.join(indexIds, Seq("id"), "left_semi")
    val absent = del.join(missing, Seq("id"), "left_anti").limit(1).collect()
    require(absent.isEmpty,
      s"$op: id ${if (absent.nonEmpty) absent(0).getLong(0) else ""} is not " +
        s"indexed at $indexPath — deleting it would corrupt the freshness " +
        "stamp")
    // one agg for the subtractive stamp terms (same hash60-of-string
    // discipline as Similarity.stampExprs, so subtraction is exact)
    val r = del.agg(count(lit(1)).as("n"),
      coalesce(sum(TextStats.hash60(col("id").cast(StringType))
          .cast(DecimalType(38, 0))),
        lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 0))).as("h")).head()
    (del, r.getLong(0), r.getDecimal(1))
  }

  /** Append the validated ids to the tombstone sidecar. */
  private def writeTombstones(spark: SparkSession, indexPath: String,
                              del: DataFrame): Unit =
    del.coalesce(1).write.mode("append").parquet(tombstones(indexPath))

  /** Logically delete documents from a [[TextIndex]] tree: tombstones +
    * subtractive `_meta` (row count, id-hash sum, AND the deleted
    * postings' token mass, so BM25's N/avgdl track the post-delete
    * corpus). The token mass needs one postings scan restricted to the
    * deleted ids — the only index-sized read in the operation, and it
    * doubles as the existence check. */
  def deleteFromTextIndex(spark: SparkSession, path: String,
                          ids: DataFrame): Unit = {
    val meta = TextIndex.loadMeta(spark, path)
    val totalTokens0 = meta.totalTokens.getOrElse(throw new IllegalStateException(
      s"text index at $path predates the BM25 posting columns " +
        "(no total_tokens in _meta); rebuild with buildTextIndex"))
    val postings = spark.read.parquet(path)
    // membership = posting ids ∪ the token-free sidecar, so a
    // token-free document is deletable too (its token mass is zero —
    // the postings semi-join below naturally contributes nothing)
    val (del, n, h) = validatedDeleteIds(spark, path, "deleteFromTextIndex",
      ids, TextIndex.indexedIds(spark, path))
    // token mass of the deleted docs: sum tf over their postings
    val delTokens = postings.join(del, Seq("id"), "left_semi")
      .agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0)
    writeTombstones(spark, path, del)
    // driver-direct subtractive stamp (the append path's MetaIO template)
    graft.store.MetaIO.writeRow(spark.sparkContext.hadoopConfiguration,
      s"$path/_meta", Seq(
        "n_buckets" -> meta.nBuckets,
        "n_rows" -> (meta.stamp.nRows - n),
        "id_hash_sum" -> meta.stamp.idHashSum.subtract(h).setScale(0),
        "total_tokens" -> (totalTokens0 - delTokens)))
  }

  /** Convenience overload: delete by literal id list. */
  def deleteFromTextIndex(spark: SparkSession, path: String,
                          ids: Seq[Long]): Unit = {
    import spark.implicits._
    deleteFromTextIndex(spark, path, ids.toDF("id"))
  }

  /** Logically delete vectors from a [[Similarity.buildIvfIndex]] tree:
    * tombstones + subtractive stamp in `_codebook` (centroids
    * unchanged — deletion never retrains). */
  def deleteFromIvfIndex(spark: SparkSession, path: String,
                         ids: DataFrame): Unit = {
    val stamp0 = Similarity.loadIvfStamp(spark, path)
    val codebook = Similarity.loadIvfCodebook(spark, path)
    val (del, n, h) = validatedDeleteIds(spark, path, "deleteFromIvfIndex",
      ids, spark.read.parquet(path).select("id"))
    writeTombstones(spark, path, del)
    Similarity.writeIvfCodebook(spark, s"$path/_codebook", codebook,
      Similarity.IvfStamp(stamp0.nRows - n, stamp0.idHashSum.subtract(h)))
  }

  def deleteFromIvfIndex(spark: SparkSession, path: String,
                         ids: Seq[Long]): Unit = {
    import spark.implicits._
    deleteFromIvfIndex(spark, path, ids.toDF("id"))
  }

  /** Logically delete documents from a [[DedupIndex]] tree: tombstones
    * + subtractive `_meta` stamp. Probes filter the `bands/` side, so a
    * tombstoned document can never generate a candidate pair. */
  def deleteFromDedupIndex(spark: SparkSession, path: String,
                           ids: DataFrame): Unit = {
    val meta = DedupIndex.loadMeta(spark, path)
    val (del, n, h) = validatedDeleteIds(spark, path, "deleteFromDedupIndex",
      ids, spark.read.parquet(s"$path/sigs").select("id"))
    writeTombstones(spark, path, del)
    graft.store.MetaIO.writeRow(spark.sparkContext.hadoopConfiguration,
      s"$path/_meta", Seq(
        "n" -> meta.n, "num_hashes" -> meta.numHashes,
        "bands" -> meta.bands,
        "n_rows" -> (meta.stamp.nRows - n),
        "id_hash_sum" -> meta.stamp.idHashSum.subtract(h).setScale(0)))
  }

  def deleteFromDedupIndex(spark: SparkSession, path: String,
                           ids: Seq[Long]): Unit = {
    import spark.implicits._
    deleteFromDedupIndex(spark, path, ids.toDF("id"))
  }

  /** Logically delete vectors from a [[Quantize.buildPqIndex]] code
    * table: tombstones + subtractive stamp in `_codebook` (PQ
    * codebooks unchanged — deletion never retrains). */
  def deleteFromPqIndex(spark: SparkSession, path: String,
                        ids: DataFrame): Unit = {
    val stamp0 = Quantize.loadPqStamp(spark, path)
    val cbs = Quantize.loadPqCodebooks(spark, path)
    val (del, n, h) = validatedDeleteIds(spark, path, "deleteFromPqIndex",
      ids, spark.read.parquet(path).select("id"))
    writeTombstones(spark, path, del)
    Quantize.writeCodebook(spark, path, cbs, Similarity.IvfStamp(
      stamp0.nRows - n, stamp0.idHashSum.subtract(h)))
  }

  def deleteFromPqIndex(spark: SparkSession, path: String,
                        ids: Seq[Long]): Unit = {
    import spark.implicits._
    deleteFromPqIndex(spark, path, ids.toDF("id"))
  }

  /** Logically delete vectors from a [[Quantize.buildIvfPqIndex]]
    * tree: tombstones + subtractive stamp in `_coarse` (both codebooks
    * unchanged). */
  def deleteFromIvfPqIndex(spark: SparkSession, path: String,
                           ids: DataFrame): Unit = {
    val stamp0 = Quantize.loadIvfPqStamp(spark, path)
    val coarse = Quantize.loadIvfPqCoarse(spark, path)
    val (del, n, h) = validatedDeleteIds(spark, path, "deleteFromIvfPqIndex",
      ids, spark.read.parquet(path).select("id"))
    writeTombstones(spark, path, del)
    Quantize.writeCoarse(spark, path, coarse, Similarity.IvfStamp(
      stamp0.nRows - n, stamp0.idHashSum.subtract(h)))
  }

  def deleteFromIvfPqIndex(spark: SparkSession, path: String,
                           ids: Seq[Long]): Unit = {
    import spark.implicits._
    deleteFromIvfPqIndex(spark, path, ids.toDF("id"))
  }

  /** Recovery for a crash between compact's two swap renames: the live
    * tree is gone but `<path>.graft-compact-old` (and possibly the
    * fully-written tmp) survive. Restores the OLD tree — the
    * conservative choice: the compacted tmp may or may not be complete,
    * the old tree certainly is; re-run compact afterwards. No-op when
    * the live tree exists. */
  def restoreAfterCrash(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val live = new Path(path)
    val old = new Path(path + ".graft-compact-old")
    if (!fs.exists(live) && fs.exists(old)) {
      require(fs.rename(old, live),
        s"restoreAfterCrash: rename $old -> $live failed")
    }
  }

  /** The staging + swap shell shared by the compacts and the shard
    * writer ([[ShardWriter]]): `writeStaged(tmpPath)` must produce a
    * complete, self-describing tree at `tmpPath`; the swap then makes
    * it live. Reads of the old tree all happen inside `writeStaged`,
    * before any rename. */
  private[ops] def stagedSwap(spark: SparkSession, path: String)
                             (writeStaged: String => Unit): Unit = {
    restoreAfterCrash(spark, path)
    val fs = fsOf(spark, path)
    val tmp = new Path(path + ".graft-compact-tmp")
    val old = new Path(path + ".graft-compact-old")
    fs.delete(tmp, true); fs.delete(old, true)
    // a REFUSED compaction (all rows tombstoned, token-free carry
    // failure, ...) must not leave the full staged tree behind: the
    // refusal explicitly tells the user NOT to retry compacting, so
    // nothing would ever reclaim an index-sized tmp directory
    try writeStaged(tmp.toString)
    catch { case e: Throwable => fs.delete(tmp, true); throw e }
    // first-time install (shard writer): no live tree to move aside —
    // one rename makes the staged tree live atomically
    if (!fs.exists(new Path(path))) {
      Option(new Path(path).getParent).foreach(fs.mkdirs)
      require(fs.rename(tmp, new Path(path)),
        s"stagedSwap: rename $tmp -> $path failed")
      return
    }
    require(fs.rename(new Path(path), old),
      s"compact: rename $path -> $old failed")
    require(fs.rename(tmp, new Path(path)),
      s"compact: rename $tmp -> $path failed (RECOVER: rename $old back " +
        s"to $path, then re-run)")
    fs.delete(old, true); ()
  }

  /** Rebuild the [[IndexIds]] Bloom sidecar at `tmpPath` from the ids
    * of the STAGED tree itself: the data rewrite already purged the
    * tombstones, so the surviving id set is a column-pruned scan of the
    * compacted output — NOT a second pass over the old tree, which
    * would re-pay the tombstone anti-join and double the compaction's
    * read I/O (id column of the fresh ~1-file-per-partition tree vs a
    * full re-read of the append-fragmented old one).
    *
    * Compaction is also the natural RESIZE point: `resize` adopts new
    * `(expectedIds, fpp)` sizing. Appends merge Blooms bit-for-bit, so
    * sizing is otherwise fixed at build time forever — an index that
    * outgrows its original `expectedIds` degrades fpp permanently
    * until a compact re-sizes it. Default keeps the live sidecar's
    * sizing (or the defaults for legacy trees). */
  /** The sidecar sizing a compact should write: the requested resize,
    * else the live sidecar's, else the defaults (legacy tree). */
  private def resolveBloomSizing(spark: SparkSession, livePath: String,
                                 resize: Option[(Long, Double)]): (Long, Double) = {
    val (expected, fpp) = resize.getOrElse(
      IndexIds.load(spark, livePath)
        .map(ib => (ib.expected, ib.fpp))
        .getOrElse((IndexIds.DefaultExpectedIds, IndexIds.DefaultFpp)))
    require(expected >= 1 && fpp > 0.0 && fpp < 1.0,
      s"compact: Bloom resize needs expectedIds >= 1 and fpp in (0, 1), " +
        s"got ($expected, $fpp)")
    (expected, fpp)
  }

  private def rebuildBloom(spark: SparkSession, livePath: String,
                           stagedIds: DataFrame, tmpPath: String,
                           resize: Option[(Long, Double)]): Unit = {
    val (expected, fpp) = resolveBloomSizing(spark, livePath, resize)
    // materialized once: the distinct set feeds the count AND the Bloom
    // aggregation — without the checkpoint each would rescan the tree
    val distinctIds = stagedIds.distinct().localCheckpoint(true)
    IndexIds.writeFresh(spark, tmpPath, distinctIds, distinctIds.count(),
      expected, fpp)
  }

  /** Compact a [[TextIndex]] tree (see class doc): tombstoned postings
    * physically purged, ~1 file per bucket directory, same
    * (bucket, token, id) order, `_meta` carried unchanged, Bloom
    * rebuilt exact, tombstones dropped. */
  def compactTextIndex(spark: SparkSession, path: String,
                       bloomResize: Option[(Long, Double)] = None): Unit =
    stagedSwap(spark, path) { tmp =>
      val meta = spark.read.parquet(s"$path/_meta")
      val nRows = meta.select("n_rows").head().getLong(0)
      val live = minusTombstones(spark, path,
        spark.read.parquet(path), "id")
      live.repartition(col("bucket"))
        .sortWithinPartitions("bucket", "token", "id")
        .write.partitionBy("bucket").mode("overwrite").parquet(tmp)
      requireStagedReadable(spark, "compactTextIndex", path, tmp)
      meta.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_meta")
      // TOKEN-FREE documents are counted in _meta and present in the
      // Bloom but index zero postings — their ids live in the
      // `_tokenfree` sidecar ([[TextIndex.loadTokenFreeIds]]). When the
      // staged distinct-id count falls short of n_rows, the sidecar
      // (minus tombstones — token-free docs are deletable) closes the
      // gap: the union is the complete live id set, so the Bloom is
      // rebuilt EXACTLY (tombstoned bits shed, resize allowed) and the
      // surviving token-free ids carry forward as a fresh sidecar.
      // Only a LEGACY tree (token-free docs but no sidecar) still falls
      // back to carrying the live Bloom verbatim — there a resize is
      // refused (unenumerable ids cannot enter a fresh filter) and a
      // missing Bloom fails loudly rather than silently shedding ids.
      // localCheckpoint: each distinct id set feeds a count AND the
      // Bloom aggregation — one real scan per source.
      val stagedIds = spark.read.parquet(tmp).select("id").distinct()
        .localCheckpoint(true)
      val nStaged = stagedIds.count()
      if (nStaged == nRows) {
        val (expected, fpp) = resolveBloomSizing(spark, path, bloomResize)
        IndexIds.writeFresh(spark, tmp, stagedIds, nStaged, expected, fpp)
      } else {
        val tfLive = TextIndex.loadTokenFreeIds(spark, path)
          .map(tf => minusTombstones(spark, path, tf, "id")
            .localCheckpoint(true))
        val union = tfLive.map(tf => stagedIds.union(tf).distinct()
          .localCheckpoint(true))
        val nUnion = union.map(_.count()).getOrElse(nStaged)
        // >= not ==: a crashed append can leave the sidecar
        // over-approximating (ids recorded, _meta never bumped) — a
        // SUPERSET Bloom stays sound (extra bits, never a false
        // negative), the same tolerance writeFresh documents
        if (nUnion >= nRows) {
          val (expected, fpp) = resolveBloomSizing(spark, path, bloomResize)
          IndexIds.writeFresh(spark, tmp, union.get, nUnion, expected, fpp)
          if (tfLive.get.limit(1).collect().nonEmpty)
            tfLive.get.coalesce(1).write.mode("overwrite")
              .parquet(TextIndex.tokenFreePath(tmp))
        } else {
          require(bloomResize.isEmpty,
            s"compactTextIndex: $path indexes ${nRows - nUnion} token-free " +
              "document(s) with no _tokenfree sidecar record (a pre-sidecar " +
              "tree) — their ids exist only in the Bloom, and a resized " +
              "rebuild would lose them. Compact without bloomResize, or " +
              "rebuild the index from source.")
          require(IndexIds.carryLive(spark, path, tmp),
            s"compactTextIndex: $path indexes ${nRows - nUnion} " +
              "token-free document(s) whose ids are recorded ONLY in the " +
              "_idbloom sidecar, which is missing or unreadable — an exact " +
              "rebuild would drop them and re-open the double-append replay " +
              "window. Rebuild the index from source.")
          tfLive.filter(_.limit(1).collect().nonEmpty).foreach(tf =>
            tf.coalesce(1).write.mode("overwrite")
              .parquet(TextIndex.tokenFreePath(tmp)))
        }
      }
    }

  /** Compact a [[Similarity.buildIvfIndex]] tree: tombstoned vectors
    * purged, ~1 file per list directory, same (list, id) order,
    * `_codebook` carried unchanged, Bloom rebuilt, tombstones
    * dropped. */
  def compactIvfIndex(spark: SparkSession, path: String,
                      bloomResize: Option[(Long, Double)] = None): Unit =
    stagedSwap(spark, path) { tmp =>
      val codebook = spark.read.parquet(s"$path/_codebook")
      val live = minusTombstones(spark, path,
        spark.read.parquet(path), "id")
      live.repartition(col("list"))
        .sortWithinPartitions("list", "id")
        .write.partitionBy("list").mode("overwrite").parquet(tmp)
      requireStagedReadable(spark, "compactIvfIndex", path, tmp)
      codebook.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_codebook")
      rebuildBloom(spark, path,
        spark.read.parquet(tmp).select("id"), tmp, bloomResize)
    }

  /** Compact a [[Quantize.buildPqIndex]] code table: tombstoned rows
    * purged, files coalesced into an id-range layout with the
    * build-time id sort, `_codebook` carried unchanged, Bloom rebuilt,
    * tombstones dropped. */
  def compactPqIndex(spark: SparkSession, path: String,
                     bloomResize: Option[(Long, Double)] = None): Unit =
    stagedSwap(spark, path) { tmp =>
      val codebook = spark.read.parquet(s"$path/_codebook")
      val live = minusTombstones(spark, path,
        spark.read.parquet(path), "id")
      live.repartitionByRange(col("id")).sortWithinPartitions("id")
        .write.mode("overwrite").parquet(tmp)
      requireStagedReadable(spark, "compactPqIndex", path, tmp)
      codebook.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_codebook")
      rebuildBloom(spark, path,
        spark.read.parquet(tmp).select("id"), tmp, bloomResize)
    }

  /** Compact a [[Quantize.buildIvfPqIndex]] tree: tombstoned rows
    * purged, ~1 file per list directory, same (list, id) order, both
    * codebook sidecars carried unchanged, Bloom rebuilt, tombstones
    * dropped. */
  def compactIvfPqIndex(spark: SparkSession, path: String,
                        bloomResize: Option[(Long, Double)] = None): Unit =
    stagedSwap(spark, path) { tmp =>
      val coarse = spark.read.parquet(s"$path/_coarse")
      val pqcb = spark.read.parquet(s"$path/_pqcb")
      val live = minusTombstones(spark, path,
        spark.read.parquet(path), "id")
      live.repartition(col("list"))
        .sortWithinPartitions("list", "id")
        .write.partitionBy("list").mode("overwrite").parquet(tmp)
      requireStagedReadable(spark, "compactIvfPqIndex", path, tmp)
      coarse.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_coarse")
      pqcb.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_pqcb")
      rebuildBloom(spark, path,
        spark.read.parquet(tmp).select("id"), tmp, bloomResize)
    }

  /** Compact a [[DedupIndex]] tree: tombstoned signatures and band
    * rows purged, both subtrees rewritten at ~shuffle-partition file
    * counts with their build-time sort, `_meta` carried unchanged,
    * Bloom rebuilt, tombstones dropped. */
  def compactDedupIndex(spark: SparkSession, path: String,
                        bloomResize: Option[(Long, Double)] = None): Unit =
    stagedSwap(spark, path) { tmp =>
      val meta = spark.read.parquet(s"$path/_meta")
      val sigs = minusTombstones(spark, path,
        spark.read.parquet(s"$path/sigs"), "id")
      sigs.repartition(col("id")).sortWithinPartitions("id")
        .write.mode("overwrite").parquet(s"$tmp/sigs")
      val bands = minusTombstones(spark, path,
        spark.read.parquet(s"$path/bands"), "id")
      bands.repartition(col("band"), col("bh"))
        .sortWithinPartitions("band", "bh", "id")
        .write.mode("overwrite").parquet(s"$tmp/bands")
      requireStagedReadable(spark, "compactDedupIndex", path,
        s"$tmp/sigs")
      meta.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_meta")
      rebuildBloom(spark, path,
        spark.read.parquet(s"$tmp/sigs").select("id"), tmp, bloomResize)
    }
}
