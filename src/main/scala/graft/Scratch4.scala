package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: decompose q187 prefixFilterPairs cost at sf0.1. */
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

    org.apache.spark.sql.GraftFunctions.register(spark)
    val docs = Tables.load(spark, dir, "documents")
    time("warm")(docs.count())
    for (rep <- 1 to 3) {
      val r0 = docs
        .select(col("doc_id"), col("lang"),
          call_function("shingle_hashes", col("text"), lit(3)).as("ts"))
        .filter(size(col("ts")) >= 1)
      val (tNum, tDen) = (7, 10)
      val r = r0.select(col("doc_id").as("__id"),
          array_compact(col("ts")).as("__ts"), col("lang"))
        .repartition(32).localCheckpoint(eager = false)
      time(s"base-ckpt-$rep")(r.count())
      val tok = r.select(col("__id"), explode(col("__ts")).as("__t"))
      val freq = tok.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
        .localCheckpoint(eager = false)
      time(s"freq-$rep")(freq.count())
      val ordered = tok.join(freq, "__t")
        .groupBy(col("__id"))
        .agg(sort_array(collect_list(struct(col("__df"), col("__t")))).as("__ord"))
        .withColumn("__sz", size(col("__ord")))
        .withColumn("__p",
          col("__sz") - expr(s"(__sz * $tNum + ${tDen - 1}) div $tDen") + 1)
        .select(col("__id"),
          explode(expr("transform(slice(__ord, 1, int(__p)), x -> x.__t)")).as("__t"))
        .localCheckpoint(eager = false)
      time(s"ordered-$rep")(ordered.count())
      val cand = ordered.select(col("__id").as("id_a"), col("__t"))
        .repartition(32, col("__t"))
        .join(ordered.select(col("__id").as("id_b"), col("__t"))
          .repartition(32, col("__t")), Seq("__t"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
        .localCheckpoint(eager = false)
      time(s"cand-$rep")(cand.count())
      val left = r.select(col("__id").as("id_a"), col("__ts").as("__ts_a"), col("lang"))
      val right = r.select(col("__id").as("id_b"), col("__ts").as("__ts_b"))
      val verified = cand.join(left, "id_a").join(right, "id_b")
        .withColumn("sz_a", size(col("__ts_a")).cast("long"))
        .withColumn("sz_b", size(col("__ts_b")).cast("long"))
        .filter(col("sz_a") * tNum <= col("sz_b") * tDen &&
          col("sz_b") * tNum <= col("sz_a") * tDen)
        .withColumn("inter",
          call_function("array_inter_size", col("__ts_a"), col("__ts_b")))
        .filter(col("inter") * tDen >= lit(tNum) * (col("sz_a") + col("sz_b") - col("inter")))
      time(s"verify-$rep")(verified.count())
    }
    spark.stop()
  }
}
