package graft.data
import graft.SparkSpec
import org.apache.spark.sql.functions._
class RagProbeTmp extends SparkSpec {
  import spark.implicits._
  test("probe stages") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      info(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val chunks = Corpus.chunkDocuments(docs, "doc_id", "text", 32, 8)
      .select((col("doc_id")*100+col("chunk_id")+1).as("id"), col("chunk_text").as("text"))
    time("chunk count")(chunks.count())
    val emb = chunks.withColumn("__hs", Similarity.tokenHashes(col("text")))
      .select(col("id"), Similarity.hashEmbed(col("__hs"), 64).as("v"))
    time("embed noop")(emb.write.format("noop").mode("overwrite").save())
    val cb = Pq.seedCodebook(8, 16, 8); val coarse = Similarity.planes(8, 64)
    val idx = time("buildIndex (lazy+encode noop)"){
      val i = Pq.buildIndex(emb, "id", "v", coarse, cb)
      i.rows.write.format("noop").mode("overwrite").save(); i }
    val dir = java.nio.file.Files.createTempDirectory("rag_probe").toString
    time("saveIndexVersioned")(Pq.saveIndexVersioned(idx, dir))
    val loaded = time("loadIndexVersioned")(Pq.loadIndexVersioned(spark, dir)._2)
    val qChunks = Corpus.chunkDocuments(docs.filter(col("doc_id") < 3), "doc_id", "text", 32, 8)
      .filter(col("chunk_id")===0).select(col("doc_id").as("id"), col("chunk_text").as("text"))
    val qEmb = qChunks.withColumn("__hs", Similarity.tokenHashes(col("text")))
      .select(col("id"), Similarity.hashEmbed(col("__hs"), 64).as("v"))
    time("searchIndex")(Pq.searchIndex(loaded, qEmb, "id", "v", 20, 2).write.format("noop").mode("overwrite").save())
    time("bm25")(Bm25.bm25TopK(chunks, qChunks, "id", "text", 20).write.format("noop").mode("overwrite").save())
  }
}
