package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.functions.native

/**
 * Raw-corpus INGESTION and EXPORT — the boundary where a crawl dump
 * lands in the engine and where curated shards leave it. Public corpus
 * releases interchange as line-delimited JSON (one document object per
 * line) or CSV; this normalizes either into the canonical
 * `(doc_id, text, source)` relation every downstream operator
 * (dedup, stats, sampling, tokenization) consumes.
 *
 * Reference anchor: the reference ingests rows positionally and trusts
 * the caller's layout (`nimtables.nim:173-175` — append-order IS the
 * schema); at corpus scale the boundary must instead be STRICT — a
 * malformed line, a missing text field, or a NULL text refuses loudly
 * (mode=FAILFAST + per-row raises). Silently dropping bad lines at
 * ingest is how a corpus ends up unreproducible.
 *
 * Scale shape: both readers are plain distributed file scans (Spark
 * splits .jsonl/.csv by line; compressed files split per codec
 * support). Pass `schema` for production runs — without it Spark runs
 * a full INFERENCE pass first, which doubles the scan at 100 TB; the
 * canonical fields are checked either way. ID assignment and
 * normalization are per-row projections (no shuffle anywhere).
 *
 * Deterministic identity: with no id column in the dump, `doc_id` is
 * the portable content hash `hash60(idSalt + ':' + text)` — stable
 * across re-runs, file splits, and engines (replayable in SQL as the
 * md5-prefix chain every other gate uses). Byte-identical documents
 * collide BY DESIGN (they are the same document; exact dedup is the
 * next pipeline stage) — pass `idField` when the dump carries real
 * ids.
 */
object CorpusIngest {

  /** Read a line-delimited JSON corpus at `path` into the canonical
    * `(doc_id, text, source)` shape. `textField` must exist and be a
    * string; NULL text refuses per row. `idField` (cast-checked long)
    * supplies ids when the dump has them, else the salted content
    * hash; `sourceField` supplies provenance, else NULL. Malformed
    * lines refuse the whole read (FAILFAST). */
  def readJsonl(spark: SparkSession, path: String,
                textField: String = "text",
                idField: Option[String] = None,
                sourceField: Option[String] = None,
                idSalt: String = "",
                schema: Option[StructType] = None): DataFrame = {
    val rd = spark.read.option("mode", "FAILFAST")
    val raw = schema.fold(rd)(rd.schema).json(path)
    normalize(raw, path, textField, idField, sourceField, idSalt)
  }

  /** [[readJsonl]] for CSV dumps: first line is the header, quoting
    * RFC-4180, malformed lines refuse (FAILFAST). Same normalization
    * and id rules. */
  def readCsv(spark: SparkSession, path: String,
              textField: String = "text",
              idField: Option[String] = None,
              sourceField: Option[String] = None,
              idSalt: String = "",
              schema: Option[StructType] = None): DataFrame = {
    val rd = spark.read.option("mode", "FAILFAST").option("header", "true")
    val raw = schema.fold(rd)(rd.schema).csv(path)
    normalize(raw, path, textField, idField, sourceField, idSalt)
  }

  private def normalize(raw: DataFrame, path: String, textField: String,
                        idField: Option[String], sourceField: Option[String],
                        idSalt: String): DataFrame = {
    (idField.toSeq ++ sourceField :+ textField).foreach { f =>
      require(raw.columns.contains(f),
        s"corpus at $path has no '$f' field — columns: " +
          raw.columns.mkString(", "))
    }
    // NULL text refuses per row: a document with no text has no place
    // in a text corpus, and silently dropping it here would make the
    // ingest unreproducible against the dump's own line count
    val text = when(col(textField).isNotNull,
      col(textField).cast(StringType))
      .otherwise(raise_error(lit(
        s"corpus at $path: '$textField' is NULL on at least one line — " +
          "fix or pre-filter the dump")))
    val id = idField match {
      case Some(f) =>
        // try_cast, so a malformed id lands on this named error under
        // ANSI and non-ANSI alike (the Similarity id discipline)
        val asLong = expr(s"try_cast(`$f` AS BIGINT)")
        when(asLong.isNotNull, asLong).otherwise(raise_error(concat(
          lit(s"corpus at $path: id field '$f' must be non-null and " +
            "numeric, got: "),
          coalesce(col(f).cast(StringType), lit("NULL")))))
      case None =>
        native.hash60(concat(lit(s"$idSalt:"), col(textField)))
    }
    val source = sourceField.fold(lit(null).cast(StringType))(f =>
      col(f).cast(StringType))
    raw.select(id.cast(LongType).as("doc_id"), text.as("text"),
      source.as("source"))
  }

  /** Export a relation as a line-delimited JSON tree at `path` (one
    * object per line, field order = column order, NULL fields omitted
    * — the interchange convention [[readJsonl]] reads back). One
    * output file per partition of `df`; repartition upstream to size
    * shards. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))
      .write.mode("overwrite").text(path)
}
