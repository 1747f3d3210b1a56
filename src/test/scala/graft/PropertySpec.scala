package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.SchemaUtil
import graft.store.{HDFStore, StoreMode}

/** Property-style tests (absent in the reference, SURVEY §5): positional-
  * read algebra against the in-memory golden value over seeded random
  * parameter sweeps, and schema-utility laws. */
class PropertySpec extends AnyFunSuite {
  import Fixture._
  private lazy val spark = TestSpark.spark
  private val rnd = new scala.util.Random(42)

  // one shared store: reads are pure, so properties can share it
  private lazy val table = {
    import spark.implicits._
    val st = HDFStore.open(spark, TestSpark.tmpDir("prop"), StoreMode.Overwrite)
    st.put("p", particles)
    // second segment exercises the multi-segment read path
    val t = st.typed[Particle]("p")
    t.append(particles.map(p => p.copy(lati = p.lati + 100)))
    t
  }
  private lazy val golden: Seq[Particle] =
    particles ++ particles.map(p => p.copy(lati = p.lati + 100))

  test("∀ valid (a,b): slice(a,b) == golden.slice(a,b+1)") {
    val n = golden.size
    (1 to 60).foreach { _ =>
      val x = rnd.nextInt(n); val y = rnd.nextInt(n)
      val (a, b) = (math.min(x, y), math.max(x, y))
      assert(table(a.toLong, b.toLong) == golden.slice(a, b + 1), s"slice [$a,$b]")
    }
  }

  test("∀ valid i: point(i) == golden(i); fromEnd mirrors") {
    val n = golden.size
    (0 until n).foreach { i =>
      assert(table(i.toLong) == golden(i), s"point $i")
    }
    (1 to n).foreach { i =>
      assert(table.fromEnd(i.toLong) == golden(n - i), s"fromEnd $i")
    }
  }

  test("∀ hyperslab params: matches the index formula") {
    val n = golden.size
    (1 to 40).foreach { _ =>
      val off = rnd.nextInt(n - 1)
      val stride = 1 + rnd.nextInt(8)
      val block = 1 + rnd.nextInt(stride)
      val maxCount = math.max(1, (n - off - block) / stride + 1)
      val count = 1 + rnd.nextInt(maxCount)
      val last = off + (count - 1) * stride + block - 1
      if (last < n) {
        val got = table.table.hyperslab(off, count, stride, block)
          .select("_rowid").collect().map(_.getLong(0)).sorted.toSeq
        val expect = (0 until count).flatMap(k =>
          (0 until block).map(b => (off + k * stride + b).toLong))
        assert(got == expect, s"hyperslab($off,$count,$stride,$block)")
      }
    }
  }

  test("∀ schemas: flatten idempotent, nested naming, compat laws") {
    import org.apache.spark.sql.types._
    val types = Seq[DataType](LongType, DoubleType, StringType, IntegerType)
    def randSchema(): StructType = {
      val k = 1 + rnd.nextInt(6)
      StructType((0 until k).map(i => StructField(s"f$i", types(rnd.nextInt(types.size)))))
    }
    (1 to 100).foreach { _ =>
      val a = randSchema(); val b = randSchema()
      assert(SchemaUtil.flatten(SchemaUtil.flatten(a)) == SchemaUtil.flatten(a))
      SchemaUtil.checkCompatibility(a, a) // reflexive: must not throw
      val nested = StructType(Seq(StructField("outer", a), StructField("tail", LongType)))
      assert(SchemaUtil.flatten(nested).fieldNames.toSeq ==
        a.fieldNames.map("outer-" + _).toSeq :+ "tail")
      if (SchemaUtil.flatten(a) != SchemaUtil.flatten(b))
        intercept[IllegalStateException] { SchemaUtil.checkCompatibility(a, b) }
    }
  }
}
