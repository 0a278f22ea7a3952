package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main: stage-by-stage timing of the heavy near-dup
  * pipelines at a given SF dir. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // see Bench.scala: codegen cache is classloader-keyed; isolation off
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.load(spark, dir, "documents")
    time("warmup-count") { docs.count() }
    val sh = docs.select(col("doc_id").as("id"), col("text"))
      .withColumn("sh", Dedup.shingleHashes(col("text"), 3))
    time("shingle-hashes") { sh.select(sum(size(col("sh")))).count() }
    val sig = sh.withColumn("sig", Dedup.minhashSignature(col("sh"), 16))
    time("minhash-sig") { sig.select(sum(element_at(col("sig"), 1))).count() }
    val banded = sig.select(col("id"), col("text"), posexplode(
      array((0 until 4).map(b => Dedup.bandHash(col("sig"), b * 4, 4)): _*)).as(Seq("band", "bh")))
    time("banded") { banded.count() }
    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"), col("text").as("text_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"), col("text").as("text_b"))
    val cand = a.join(b, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "text_a", "text_b").distinct()
    time("candidates") { cand.count() }
    val verified = cand.withColumn("jaccard", Dedup.jaccard(
        Dedup.shingles(col("text_a"), 3), Dedup.shingles(col("text_b"), 3)))
      .filter(col("jaccard") >= 0.5)
    time("verified") { verified.count() }
    time("full-query") { Dedup.minhashNearDups(docs, "doc_id", "text").count() }

    import graft.similarity.Similarity
    val emb = Tables.load(spark, dir, "embeddings")
    time("emb-warmup") { emb.count() }
    val bn = Similarity.bucketNorm(emb, "vec_id", "embedding", 8, 64)
    time("emb-bucketNorm") { bn.count() }
    val ea = bn.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a"))
    val eb = bn.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b"))
    val ej = ea.join(eb, Seq("bucket")).filter(col("id_a") < col("id_b"))
    time("emb-join") { ej.count() }
    val ec = Similarity.appendCosine(ej, "v_a", "v_b", "nrm_a", "nrm_b", "cosine")
    time("emb-cosine") { ec.count() }
    time("emb-full") { Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.4).count() }
    println("=== plan of embedding near-dups ===")
    Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.4).explain("formatted")
    spark.stop()
  }
}
