package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: decompose q31 minhashNearDups cost at sf0.1. */
object Scratch4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskMs = new AtomicLong(0)
    val nTasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) {
          nTasks.incrementAndGet()
          taskMs.addAndGet(te.taskInfo.duration): Unit
        }
    })
    def time(label: String)(f: => Any): Unit = {
      taskMs.set(0); nTasks.set(0)
      val t0 = System.nanoTime()
      val r = f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      println(f"SCR4 $label%-28s wall=$w%7.3f s n=${nTasks.get}%4d " +
        f"taskTime=${taskMs.get / 1000.0}%8.2f s res=$r")
    }

    import graft.dedup.Dedup
    val docs = Tables.load(spark, dir, "documents")
    time("warm")(docs.count())
    val banded = Dedup.minhashBands(docs, "doc_id", "text", 2, 16, 8)
    time("banded")(banded.count())
    time("banded2")(banded.count())
    val cand0 = Dedup.bucketedPairs(banded, Seq("band", "bh"), "id", 4096)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("pairs-nodistinct")(cand0.count())
    val cand = cand0.distinct()
    time("cand-distinct")(cand.count())
    time("cand-distinct2")(cand.count())
    val sets = Dedup.shingleHashSets(docs, "doc_id", "text", 2)
    time("sets")(sets.count())
    time("sets2")(sets.count())
    val withSets = cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
    time("withSets")(withSets.count())
    val ver = Dedup.appendJaccard(withSets, "sh_a", "sh_b", "jaccard")
      .filter(col("jaccard") >= 0.7)
    time("verified")(ver.count())
    time("verified2")(ver.count())
    // prefilter selectivity probe
    org.apache.spark.sql.GraftFunctions.register(spark)
    val banded2 = docs.select(col("doc_id").as("id"),
        coalesce(col("text"), lit("")).as("text"))
      .repartition(32)
      .select(col("id"),
        size(call_function("shingle_hashes", col("text"), lit(2))).cast("long").as("sz"),
        posexplode(call_function("minhash_band_keys", col("text"), lit(2), lit(16), lit(8))))
      .select(col("pos").as("band"), col("col").as("bh"), col("id"), col("sz"))
    val rawPairs = Dedup.bucketedPairs(banded2, Seq("band", "bh"), "id", 4096)
    time("raw-pairs")(rawPairs.count())
    time("filt-pairs")(rawPairs.filter(lit(10000L) * least(col("a.sz"), col("b.sz")) >=
      lit(6999L) * greatest(col("a.sz"), col("b.sz"))).count())
    time("full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.7).count())
    time("full2")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.7).count())
    spark.stop()
  }
}
