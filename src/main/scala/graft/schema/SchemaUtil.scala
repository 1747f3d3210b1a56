package graft.schema

import org.apache.spark.sql.types._

/**
 * Case-class / StructType utilities reproducing the reference's compile-time
 * schema machinery (rolandgg/nimHDFStore `typeinspect.nim:3-63`) on Spark.
 *
 *  - `flatten` reproduces the one-level nested-record flattening with
 *    `"parent-child"` field naming (`typeinspect.nim:54-63`).
 *  - `checkCompatibility` reproduces the open-time layout validation
 *    (`checkCompatiblity`, `nimtables.nim:133-138`): field count, field
 *    names, field types — failing fast on any mismatch. (The reference
 *    checks byte offsets/sizes; the Spark-native equivalent of "layout"
 *    is name + type + order.)
 *  - `widen` documents/applies the unsigned-type widening of SURVEY §1.2
 *    (Spark has no unsigned types: uint32 → LongType, uint64 → Decimal(20,0)).
 *
 * All pure functions — property-testable without a SparkSession.
 */
object SchemaUtil {

  /** Separator used by the reference when flattening nested records:
    * field `b` of nested object `a` becomes column `"a-b"`
    * (`typeinspect.nim:21,59`). */
  val NestedSep = "-"

  /** Flatten one level of StructType nesting using `parent-child` names.
    * Deeper nesting is flattened recursively (the reference supports only
    * one level; we generalize, which is a superset). */
  def flatten(schema: StructType): StructType = {
    def fields(prefix: String, st: StructType): Seq[StructField] =
      st.fields.toSeq.flatMap { f =>
        val name = if (prefix.isEmpty) f.name else prefix + NestedSep + f.name
        f.dataType match {
          case nested: StructType => fields(name, nested)
          case dt                 => Seq(StructField(name, dt, f.nullable, f.metadata))
        }
      }
    StructType(fields("", schema))
  }

  /** Unsigned-width widening for types Spark lacks (SURVEY §1.2 table).
    * Given a parquet-signed schema this is the identity; kept as the single
    * place the uint mapping policy lives. */
  def widen(dt: DataType): DataType = dt match {
    case ByteType    => ByteType
    case ShortType   => ShortType
    case IntegerType => IntegerType
    case LongType    => LongType
    case ArrayType(et, n) => ArrayType(widen(et), n)
    case st: StructType   => StructType(st.fields.map(f => f.copy(dataType = widen(f.dataType))))
    case other => other
  }

  /** Schema-compatibility check ≙ `checkCompatiblity` (`nimtables.nim:133-138`).
    * Compares expected (compile-time / Encoder-derived) layout against the
    * stored layout: same number of fields, and for each position the same
    * name and type. Nullability is not part of the reference's layout
    * contract (packed C structs have no nulls) and is ignored.
    *
    * @throws IllegalStateException on any mismatch, naming the first
    *         offending field — fail-fast like the reference's `assert`.
    */
  def checkCompatibility(expected: StructType, actual: StructType): Unit = {
    val exp = flatten(expected)
    val act = flatten(actual)
    if (exp.length != act.length)
      throw new IllegalStateException(
        s"incompatible table layout: expected ${exp.length} fields, stored ${act.length}")
    exp.fields.zip(act.fields).zipWithIndex.foreach { case ((e, a), i) =>
      if (e.name != a.name)
        throw new IllegalStateException(
          s"incompatible table layout at field $i: expected name '${e.name}', stored '${a.name}'")
      if (!sameType(e.dataType, a.dataType))
        throw new IllegalStateException(
          s"incompatible table layout at field '${e.name}': expected type ${e.dataType.sql}, stored ${a.dataType.sql}")
    }
  }

  /** DataFrame-level flattening: nested struct fields become top-level
    * `parent-child` columns — the write-side behavior of the reference's
    * table layer (a nested Nim object is stored as flat offset fields,
    * `typeinspect.nim:15-25`). */
  def flattenDf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    def refs(prefix: String, outName: String, st: StructType): Seq[(String, String)] =
      st.fields.toSeq.flatMap { f =>
        val path = if (prefix.isEmpty) s"`${f.name}`" else s"$prefix.`${f.name}`"
        val name = if (outName.isEmpty) f.name else outName + NestedSep + f.name
        f.dataType match {
          case nested: StructType => refs(path, name, nested)
          case _                  => Seq((path, name))
        }
      }
    val cols = refs("", "", df.schema).map { case (path, name) => col(path).as(name) }
    df.select(cols: _*)
  }

  /** Type equality modulo nullability metadata inside arrays/structs. */
  def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ae, _), ArrayType(be, _)) => sameType(ae, be)
    case (as: StructType, bs: StructType) =>
      as.length == bs.length && as.fields.zip(bs.fields).forall {
        case (af, bf) => af.name == bf.name && sameType(af.dataType, bf.dataType)
      }
    case _ => a == b
  }
}
