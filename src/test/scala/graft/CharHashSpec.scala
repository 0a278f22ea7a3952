package graft

import org.apache.spark.sql.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.expressions.CharHash
import org.apache.spark.unsafe.types.UTF8String

class CharHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("native char_hash == kernel charHashStr == HOF expression fold") {
    GraftFunctions.register(spark)
    val inputs = Seq("hello", "", "a b c", "The quick brown fox!", "x" * 500)
    val df = inputs.toDF("s")
    val native = df.select(call_function("char_hash", $"s")).collect().map(_.getLong(0))
    val hof = df.select(Dedup.charHash($"s")).collect().map(_.getLong(0))
    val kernel = inputs.map(Dedup.charHashStr)
    assert(native.toSeq == kernel)
    assert(hof.toSeq == kernel)
    // static entry point used by generated code agrees too
    assert(CharHash.hash(UTF8String.fromString("hello")) == Dedup.charHashStr("hello"))
  }

  test("char_hash is null-intolerant: null in, null out") {
    GraftFunctions.register(spark)
    val df = Seq(Some("x"), None).toDF("s")
      .select(call_function("char_hash", $"s").as("h"))
    assert(df.filter($"h".isNull).count() == 1)
  }

  test("char_hash is usable from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT char_hash('hello') AS h").head().getLong(0)
    assert(r == Dedup.charHashStr("hello"))
  }

  test("char_hash participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // (a local Seq would be constant-folded into a LocalTableScan)
    val df = spark.range(10)
      .select(call_function("char_hash", $"id".cast("string")).as("h"))
    // "*(n)" marks a WholeStageCodegen stage in the plan's simpleString;
    // the Project evaluating char_hash must carry it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("char_hash")))
    assert(df.agg(countDistinct($"h")).head().getLong(0) == 10L)
  }

  test("registration is idempotent") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT char_hash('x')").count() == 1)
  }

  test("contains_any_term: automaton matches naive substring semantics, randomized") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    def randStr(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(3))).mkString
    for (_ <- 1 to 200) {
      val terms = (1 to 1 + rnd.nextInt(5)).map(_ => randStr(1 + rnd.nextInt(4)))
      val text = randStr(rnd.nextInt(20))
      val expected = terms.exists(t => text.toLowerCase.contains(t.toLowerCase))
      val ac = new graft.expressions.AhoCorasick(terms)
      val got = ac.containsAny(org.apache.spark.unsafe.types.UTF8String.fromString(text))
      assert(got == expected, s"terms=$terms text=$text")
    }
  }

  test("contains_any_term: fail-transition overlaps and case-insensitivity") {
    val ac = new graft.expressions.AhoCorasick(Seq("abxy", "bxz"))
    def hit(s: String) = ac.containsAny(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(hit("aabxz"))   // needs the abx → bx fail link
    assert(hit("ABXY"))    // case-insensitive
    assert(!hit("abx"))
    assert(!hit(""))
  }

  test("contains_any_term is usable from SQL and codegen'd") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT contains_any_term('clean SPAMword here', 'spamword', 'other') AS h").head()
    assert(r.getBoolean(0))
    val df = spark.range(10).select(
      call_function("contains_any_term", $"id".cast("string"), lit("5")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("contains_any_term")))
    assert(df.filter($"h").count() == 1)
  }
}
