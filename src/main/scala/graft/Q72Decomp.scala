package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sinks.JdbcUpsertSink

/** Adjudication instrument for q72_stream_upsert (VERDICT r15 item 1):
  * decompose the query's wall into LANDING (write the stream's source
  * files), DRAIN-SPARK (micro-batch machinery + the repartition/sort
  * shuffle, measured by a control run whose sink consumes rows without
  * JDBC), DRAIN-STORE (the residual: Derby MERGE + commit), and READBACK
  * (the union-of-shards JDBC scan). Args: sfDir [nShards] [batchSize].
  *
  * The phases replicate the query body exactly (same landing layout, same
  * maxFilesPerTrigger=1 two-batch drain, same shard DDL); the only
  * difference is the timers.
  */
object Q72Decomp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf10")
    val nShards = args.lift(1).map(_.toInt).getOrElse(8)
    val batchSize = args.lift(2).map(_.toInt).getOrElse(500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"Q72DECOMP $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val work = Files.createTempDirectory("q72decomp_")
    val flat = Tables.load(spark, dir, "events").select(
        col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_type"),
        round(col("value") * 100, 0).cast("long").as("value_cents"))
      .filter(col("event_id") % 7 === 0)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("event_type", StringType),
      StructField("value_cents", LongType)))

    val landing = work.resolve("landing").toString
    val nRows = t("landing") {
      flat.unionAll(flat).repartition(2, col("event_id"))
        .write.parquet(landing)
      spark.read.parquet(landing).count()
    }
    println(s"Q72DECOMP rows_landed $nRows (2 waves)")

    val table = "events_serving"
    val urls = (0 until nShards).map(i =>
      "jdbc:derby:" + work.resolve(s"shard$i").toAbsolutePath + ";create=true")
    t("shard_ddl") {
      urls.foreach { url =>
        val conn = java.sql.DriverManager.getConnection(url)
        try conn.createStatement().executeUpdate(
          s"CREATE TABLE $table (event_id BIGINT PRIMARY KEY, ts_us BIGINT, " +
            "event_type VARCHAR(64), value_cents BIGINT)")
        finally conn.close()
      }
    }

    def drain(tag: String)(eachBatch: DataFrame => Unit): Double = {
      var inBatch = 0.0
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(landing)
        .writeStream
        .option("checkpointLocation",
          work.resolve(s"ckpt_$tag").toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val t0 = System.nanoTime()
          eachBatch(batch)
          inBatch += (System.nanoTime() - t0) / 1e9
        }
        .start()
      q.processAllAvailable()
      q.stop()
      inBatch
    }

    // CONTROL: identical plan shape (shard column, repartition, sort,
    // foreachPartition that CONSUMES every row) but no JDBC — everything
    // this costs is Spark-side; the real drain minus this is the store.
    val sparkSide = t("drain_control") {
      drain("ctl") { batch =>
        val cols = batch.columns.toSeq
        batch.select(cols.map(col) :+
            pmod(xxhash64(col("event_id")), lit(nShards.toLong))
              .cast("int").as("__shard"): _*)
          .repartition(nShards, col("__shard"))
          .sortWithinPartitions("__shard")
          .foreachPartition { (rows: Iterator[Row]) =>
            var x = 0L
            rows.foreach(r => x ^= r.getLong(0))
            if (x == Long.MinValue) println("")
          }
      }
    }
    println(f"Q72DECOMP   in-batch control  $sparkSide%8.2f s (Spark-side shape)")

    val upsertSide = t("drain_upsert") {
      drain("ups") { batch =>
        JdbcUpsertSink.upsertSharded(batch, nShards, urls(_), table,
          Seq("event_id"), batchSize = batchSize)
      }
    }
    println(f"Q72DECOMP   in-batch upsert   $upsertSide%8.2f s " +
      f"(store-side ~= ${upsertSide - sparkSide}%.2f s)")

    val got = t("readback") {
      urls.map { url =>
          spark.read.format("jdbc").option("url", url)
            .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
            .option("dbtable", table).load()
        }.reduce(_ unionAll _)
        .orderBy(col("EVENT_ID")).count()
    }
    println(s"Q72DECOMP rows_read $got nShards=$nShards batchSize=$batchSize")
    spark.stop()
  }
}
