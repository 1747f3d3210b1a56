package graft.store

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Typed attribute values — the K/V metadata the reference attaches to any
 * object (`nimhdf5/attributes.nim:207-437`). Supported kinds mirror the
 * reference: integer, float, string, and sequences thereof. `Boolean` is
 * deliberately NOT representable — the reference rejects bool attributes
 * (`nimhdf5/attributes.nim:289-293`).
 */
sealed trait AttrValue
object AttrValue {
  final case class I64(v: Long)            extends AttrValue
  final case class F64(v: Double)          extends AttrValue
  final case class Str(v: String)          extends AttrValue
  final case class I64Seq(v: Seq[Long])    extends AttrValue
  final case class F64Seq(v: Seq[Double])  extends AttrValue
  final case class StrSeq(v: Seq[String])  extends AttrValue

  /** Non-finite doubles don't round-trip through the JSON catalog (jackson
    * emits non-strict tokens that [[fromJson]] would reject, making the
    * commit look torn) — reject them up front. */
  private def finite(d: Double): Double = {
    require(!d.isNaN && !d.isInfinite,
      s"non-finite attribute value $d cannot round-trip through the JSON catalog")
    d
  }

  def of(v: Any): AttrValue = v match {
    case b: Boolean => throw new UnsupportedOperationException(
      "bool attributes are not supported (parity with nimhdf5/attributes.nim:289-293)")
    case i: Int     => I64(i.toLong)
    case l: Long    => I64(l)
    case f: Float   => F64(finite(f.toDouble))
    case d: Double  => F64(finite(d))
    case s: String  => Str(s)
    case xs: Seq[_] if xs.isEmpty => I64Seq(Nil)
    case xs: Seq[_] if xs.head.isInstanceOf[Boolean] =>
      throw new UnsupportedOperationException(
        "bool sequence attributes are not supported (parity with nimhdf5/attributes.nim:289-293)")
    case xs: Seq[_] => xs.head match {
      case _: Int    => I64Seq(xs.map(_.asInstanceOf[Int].toLong))
      case _: Long   => I64Seq(xs.map(_.asInstanceOf[Long]))
      case _: Double => F64Seq(xs.map(x => finite(x.asInstanceOf[Double])))
      case _: Float  => F64Seq(xs.map(x => finite(x.asInstanceOf[Float].toDouble)))
      case _: String => StrSeq(xs.map(_.asInstanceOf[String]))
      case other => throw new UnsupportedOperationException(s"unsupported attr seq element: $other")
    }
    case other => throw new UnsupportedOperationException(s"unsupported attr value: $other")
  }

  def toJson(a: AttrValue): JValue = a match {
    case I64(v)    => JObject("t" -> JString("i64"), "v" -> JLong(v))
    case F64(v)    => JObject("t" -> JString("f64"), "v" -> JDouble(v))
    case Str(v)    => JObject("t" -> JString("str"), "v" -> JString(v))
    case I64Seq(v) => JObject("t" -> JString("i64[]"), "v" -> JArray(v.toList.map(JLong(_))))
    case F64Seq(v) => JObject("t" -> JString("f64[]"), "v" -> JArray(v.toList.map(JDouble(_))))
    case StrSeq(v) => JObject("t" -> JString("str[]"), "v" -> JArray(v.toList.map(JString(_))))
  }

  def fromJson(j: JValue): AttrValue = {
    val JString(t) = j \ "t"
    val v = j \ "v"
    (t, v) match {
      case ("i64", jv)          => I64(num(jv))
      case ("f64", jv)          => F64(dbl(jv))
      case ("str", JString(s))  => Str(s)
      case ("i64[]", JArray(a)) => I64Seq(a.map(num))
      case ("f64[]", JArray(a)) => F64Seq(a.map(dbl))
      case ("str[]", JArray(a)) => StrSeq(a.map { case JString(s) => s; case o => o.toString })
      case other                => throw new IllegalStateException(s"bad attr json: $other")
    }
  }
  private def num(j: JValue): Long = j match {
    case JLong(l) => l; case JInt(i) => i.toLong; case JDouble(d) => d.toLong
    case o => throw new IllegalStateException(s"not a number: $o")
  }
  private def dbl(j: JValue): Double = j match {
    case JDouble(d) => d; case JLong(l) => l.toDouble; case JInt(i) => i.toDouble
    case JDecimal(d) => d.toDouble
    case o => throw new IllegalStateException(s"not a number: $o")
  }
}

/** One immutable run of rows of a table. `rows` is cached (≙ the reference's
  * cached `nrecords`, `nimtables.nim:128`); `dir` is relative to the store
  * root and may point at a segment DIRECTORY or (after file-granular
  * mutation refinement) a single parquet FILE. Stored row-ids inside the
  * run are dense `[idBase, idBase + rows)` — `idBase` is nonzero exactly
  * for file runs carved out of a larger segment, so untouched files keep
  * their bytes AND their stored ids. The global offset of a run is the
  * prefix sum of preceding runs' `rows`, so append/delete/insert touch
  * only affected runs and the rest shift by METADATA only (SURVEY §7.4).
  *
  * `fileRows` caches the per-parquet-file row counts of a DIRECTORY run
  * in file-name order, recorded once at write time — file-granular
  * mutation refinement then needs one directory listing instead of one
  * footer read per file (on object storage with 100k files the footer
  * loop would dominate every mutation). Empty for single-file runs. */
final case class SegmentMeta(dir: String, rows: Long, idBase: Long = 0L,
                             fileRows: Vector[Long] = Vector.empty)

/** Catalog entry for one named object in the store. */
final case class TableMeta(
    kind: String,                    // "table" | "ndarray"
    segments: Vector[SegmentMeta],
    schemaJson: String,              // Spark StructType json of the DATA columns (no _rowid)
    chunkSize: Option[Long],         // ≙ HDF5 chunk size; maps to maxRecordsPerFile
    codec: Option[String],           // parquet compression codec
    aliasOf: Option[String],         // hardlink: name this entry aliases (data shared)
    shape: Vector[Long] = Vector.empty,    // ndarray only
    maxShape: Vector[Long] = Vector.empty  // ndarray only; -1 ≙ H5S_UNLIMITED
) {
  def rows: Long = segments.map(_.rows).sum
  /** Global start offset of each segment (prefix sums). */
  def offsets: Vector[Long] = segments.scanLeft(0L)(_ + _.rows).init
}

/**
 * The store catalog: named tables, group namespace, typed attributes —
 * the Spark-native analog of the HDF5 file structure the reference walks
 * (`nimtables.nim:40-58`). Persisted as a single JSON document with an
 * atomic tmp-file + rename swap, so every mutation commits atomically
 * (SURVEY §7.4 item 2: write-new, commit-pointer).
 */
final class Manifest private (
    var tables: Map[String, TableMeta],
    var groups: Set[String],
    var attrs: Map[String, Map[String, AttrValue]],
    var version: Long) {

  def toJson: JValue = JObject(
    "version" -> JLong(version),
    "tables" -> JObject(tables.toList.sortBy(_._1).map { case (name, t) =>
      name -> JObject(
        "kind" -> JString(t.kind),
        "segments" -> JArray(t.segments.toList.map { s =>
          val fields = List[(String, JValue)](
            "dir" -> JString(s.dir), "rows" -> JLong(s.rows),
            "idBase" -> JLong(s.idBase)) ++
            (if (s.fileRows.isEmpty) Nil
             else List("fileRows" -> JArray(s.fileRows.toList.map(JLong(_): JValue))))
          JObject(fields: _*)
        }),
        "schema" -> JString(t.schemaJson),
        "chunkSize" -> t.chunkSize.map(JLong(_)).getOrElse(JNull),
        "codec" -> t.codec.map(JString(_)).getOrElse(JNull),
        "aliasOf" -> t.aliasOf.map(JString(_)).getOrElse(JNull),
        "shape" -> JArray(t.shape.toList.map(JLong(_))),
        "maxShape" -> JArray(t.maxShape.toList.map(JLong(_))))
    }),
    "groups" -> JArray(groups.toList.sorted.map(JString(_))),
    "attrs" -> JObject(attrs.toList.sortBy(_._1).map { case (obj, kv) =>
      obj -> JObject(kv.toList.sortBy(_._1).map { case (k, v) => k -> AttrValue.toJson(v) })
    })
  )
}

object Manifest {
  /** Manifests are versioned files under `_manifest/`; readers take the
    * highest version, writers create the next one. File create+close is
    * atomic-visibility on HDFS (and on local FS for our write-then-read
    * pattern), so a catalog swap needs no in-place rename — the same
    * write-new/commit-pointer scheme Delta-style logs use. */
  val Dir = "_manifest"
  private val VersionRe = """v(\d{12})\.json""".r
  private val Keep = 5 // versions retained after a save

  def empty: Manifest = new Manifest(Map.empty, Set.empty, Map.empty, 0L)

  private def parses(fs: FileSystem, p: Path): Boolean = readVersion(fs, p).isDefined

  def exists(fs: FileSystem, root: Path): Boolean =
    fs.exists(new Path(root, Dir)) && latestFile(fs, root).isDefined

  private def latestFile(fs: FileSystem, root: Path): Option[(Long, Path)] = {
    val dir = new Path(root, Dir)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case VersionRe(n) => Some((n.toLong, st.getPath))
        case _            => None
      }
    }.sortBy(_._1).lastOption
  }

  /** Load the highest parseable version (a torn highest file — crashed
    * writer — falls back to the previous committed version).
    * `atVersion` pins a historical catalog version instead — time travel
    * over the retained window ([[Keep]] versions; older data files exist
    * until [[graft.store.HDFStore.vacuum]]). */
  def load(fs: FileSystem, root: Path, atVersion: Option[Long] = None): Manifest = {
    val dir = new Path(root, Dir)
    if (!fs.exists(dir)) return empty
    val versions = fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case VersionRe(n) => Some((n.toLong, st.getPath)); case _ => None
      }
    }.sortBy(-_._1) match {
      case vs => atVersion match {
        case Some(want) =>
          val hit = vs.filter(_._1 == want)
          if (hit.isEmpty) throw new NoSuchElementException(
            s"no manifest version $want (retained: ${vs.map(_._1).sorted.mkString(", ")})")
          hit
        case None => vs
      }
    }
    versions.foreach { case (v, p) =>
      readVersion(fs, p) match {
        case Some(m) => m.version = v; return m
        case None if atVersion.isDefined =>
          // a PINNED version that exists but won't parse is an error, not
          // an empty store — silent fallback would mask live data
          throw new IllegalStateException(s"manifest version ${atVersion.get} is unreadable (torn commit?)")
        case None => () // unpinned: torn latest, try the previous one
      }
    }
    empty
  }

  /** Read + parse one manifest file; None if torn/corrupt. */
  private def readVersion(fs: FileSystem, p: Path): Option[Manifest] =
    try {
      val in = fs.open(p)
      val bytes = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, false)
        out.toByteArray
      } finally in.close()
      Some(fromJson(JsonMethods.parse(new String(bytes, StandardCharsets.UTF_8))))
    } catch { case _: Exception => None }

  def fromJson(j: JValue): Manifest = {
    val version = j \ "version" match { case JLong(l) => l; case JInt(i) => i.toLong; case _ => 0L }
    val tables = (j \ "tables") match {
      case JObject(fields) => fields.map { case (name, t) =>
        val segs = (t \ "segments") match {
          case JArray(a) => a.map { s =>
            val JString(dir) = s \ "dir"
            def long(v: JValue): Long = v match { case JLong(l) => l; case JInt(i) => i.toLong; case _ => 0L }
            val fileRows = s \ "fileRows" match {
              case JArray(fr) => fr.map(long).toVector
              case _ => Vector.empty[Long]
            }
            SegmentMeta(dir, long(s \ "rows"), long(s \ "idBase"), fileRows)
          }.toVector
          case _ => Vector.empty[SegmentMeta]
        }
        def optStr(v: JValue): Option[String] = v match { case JString(s) => Some(s); case _ => None }
        def optLong(v: JValue): Option[Long] = v match { case JLong(l) => Some(l); case JInt(i) => Some(i.toLong); case _ => None }
        def longs(v: JValue): Vector[Long] = v match {
          case JArray(a) => a.map { case JLong(l) => l; case JInt(i) => i.toLong; case _ => 0L }.toVector
          case _ => Vector.empty
        }
        val JString(kind) = t \ "kind"
        val JString(schema) = t \ "schema"
        name -> TableMeta(kind, segs, schema, optLong(t \ "chunkSize"), optStr(t \ "codec"),
          optStr(t \ "aliasOf"), longs(t \ "shape"), longs(t \ "maxShape"))
      }.toMap
      case _ => Map.empty[String, TableMeta]
    }
    val groups = (j \ "groups") match {
      case JArray(a) => a.collect { case JString(s) => s }.toSet
      case _ => Set.empty[String]
    }
    val attrs = (j \ "attrs") match {
      case JObject(fields) => fields.map { case (obj, kv) =>
        obj -> (kv match {
          case JObject(ks) => ks.map { case (k, v) => k -> AttrValue.fromJson(v) }.toMap
          case _ => Map.empty[String, AttrValue]
        })
      }.toMap
      case _ => Map.empty[String, Map[String, AttrValue]]
    }
    new Manifest(tables, groups, attrs, version)
  }

  /** Commit the next catalog version with OPTIMISTIC CONCURRENCY: the
    * version file is created exclusively (`create(overwrite=false)` is an
    * atomic claim on HDFS/local), so of two racing writers exactly one
    * wins and the loser gets a `ConcurrentModificationException` to
    * reload-and-retry on. Prunes versions beyond [[Keep]].
    * (The reference is single-process and has no analog; this is what a
    * multi-writer 1000-executor deployment needs.) */
  def save(fs: FileSystem, root: Path, m: Manifest): Unit = {
    val dir = new Path(root, Dir)
    fs.mkdirs(dir)
    val newer = fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case VersionRe(n) if n.toLong > m.version => Some((n.toLong, st.getPath))
        case _ => None
      }
    }
    // newer PARSEABLE versions = a real concurrent commit; torn files from
    // crashed writers don't count (the claim below reclaims their slot)
    newer.find { case (_, p) => parses(fs, p) }.foreach { case (v, _) =>
      throw new java.util.ConcurrentModificationException(
        s"manifest advanced to v$v behind this handle (at v${m.version}); reload and retry")
    }
    val target = new Path(dir, f"v${m.version + 1}%012d.json")
    def claim(): org.apache.hadoop.fs.FSDataOutputStream =
      try fs.create(target, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException | _: java.io.IOException =>
          // a torn target (crashed writer mid-write) self-heals; a valid
          // one means we genuinely lost the race
          if (fs.exists(target) && !parses(fs, target)) {
            fs.delete(target, false)
            try fs.create(target, false) catch {
              case _: Exception => throw new java.util.ConcurrentModificationException(
                s"lost commit race for ${target.getName}; reload and retry")
            }
          } else throw new java.util.ConcurrentModificationException(
            s"lost commit race for ${target.getName}; reload and retry")
      }
    val out = claim()
    m.version += 1
    try {
      try out.write(JsonMethods.pretty(JsonMethods.render(m.toJson)).getBytes(StandardCharsets.UTF_8))
      finally out.close()
    } catch {
      case e: Throwable => // never leave a torn latest version behind
        m.version -= 1
        try fs.delete(target, false) catch { case _: Throwable => () }
        throw e
    }
    // prune
    fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match { case VersionRe(n) => Some((n.toLong, st.getPath)); case _ => None }
    }.sortBy(_._1).dropRight(Keep).foreach { case (_, p) => fs.delete(p, false) }
  }
}
