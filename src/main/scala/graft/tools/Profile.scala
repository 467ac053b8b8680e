package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.{GraftSession, Tables}
import graft.ext.{Dedup, TextAnalysis}

/** Ad-hoc stage profiler for the near-dup path (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("local[32]", "graft-profile")
    val docs = Tables.load(spark, sf, "documents")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed("shingle+count")(
      Dedup.shingled(docs, 3).agg(sum(size(col("sg")))).head())
    val sg = Dedup.shingled(docs, 3).cache()
    timed("shingle cache")(sg.count())
    val inv = sg.select(col("doc_id"), explode(col("sg")).as("sh"))
    timed("invert")(inv.count())
    timed("selfjoin+group")(
      inv.select(col("sh"), col("doc_id").as("da"))
        .join(inv.select(col("sh"), col("doc_id").as("db")), Seq("sh"))
        .filter(col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1))).count())
    timed("full index pairs")(Dedup.jaccardPairsIndex(docs, 3, 0.5).count())
    timed("index pairs hashed")(
      Dedup.jaccardPairsIndexHashed(docs, 3, 0.5).count())
    timed("hashes only")(
      Dedup.shingled(docs, 3)
        .select(Dedup.shingleHashes(col("sg")).as("hv"))
        .agg(sum(size(col("hv")))).head())
    timed("minhash sig")(
      Dedup.shingled(docs, 3)
        .withColumn("hv", Dedup.shingleHashes(col("sg")))
        .select(Dedup.minhashSignature(col("hv"), 128).as("sig"))
        .agg(sum(size(col("sig")))).head())
    timed("lsh pairs")(Dedup.jaccardPairsLsh(docs, 3, 0.5).count())
    timed("prefix pairs")(Dedup.jaccardPairsPrefix(docs, 3, 0.5).count())

    val emb = Tables.load(spark, sf, "embeddings")
    import graft.ext.Similarity
    timed("ivf warm scan")(emb.count())
    val cent = emb.filter(col("vec_id") < 8)
    timed("ivf corpus assign")(
      emb.select(col("vec_id").as("cid"), col("embedding").as("ce"),
        Similarity.norm(col("embedding")).as("cn"))
        .join(broadcast(cent.select(col("vec_id").as("cent_id"),
          col("embedding").as("cent_e"),
          Similarity.norm(col("embedding")).as("cent_n"))))
        .groupBy(col("cid"))
        .agg(max_by(col("cent_id"),
          Similarity.dot(col("ce"), col("cent_e")) /
            (col("cn") * col("cent_n"))).as("cell"))
        .count())
    timed("ivf full")(Similarity.topKIvf(emb, emb.filter(col("vec_id") < 10), 10).count())
    // hyperplane near-dup stage breakdown (codegen'd sketch expression)
    val banded = emb.select(col("vec_id"),
      posexplode(graft.functions.HyperplaneSketch.hyperplane_sketch(
        col("embedding"), 64, 6, 32)).as(Seq("t", "b")))
    timed("neardup sketch only")(banded.count())
    val cand = banded.select(col("t"), col("b"), col("vec_id").as("va"))
      .join(banded.select(col("t"), col("b"), col("vec_id").as("vb")),
        Seq("t", "b"))
      .filter(col("va") < col("vb"))
      .select("va", "vb").distinct()
    timed("neardup candidates")(println("cand rows: " + cand.count()))
    timed("neardup lsh full")(Similarity.nearDupPairsLsh(emb, 0.4).count())
    timed("neardup blocked full")(Similarity.nearDupPairsBlocked(emb, 0.4).count())
    // x17 stage breakdown
    val lshPairs = Dedup.jaccardPairsLsh(docs, 3, 0.5)
    timed("cluster edges (lsh pairs)")(lshPairs.count())
    timed("cluster full")(Dedup.dedupClusters(docs, lshPairs).count())
    timed("cluster full (index edges, x17 shape)")(
      Dedup.dedupClusters(docs, Dedup.jaccardPairsIndex(docs, 3, 0.5)).count())
    timed("cluster full (hashed edges)")(
      Dedup.dedupClusters(docs,
        Dedup.jaccardPairsIndexHashed(docs, 3, 0.5)).count())
    timed("pq topk full (x24 shape)")(
      Similarity.topKPq(emb, emb.filter(col("vec_id") < 10), 10).count())
    spark.stop()
  }
}
