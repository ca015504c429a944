package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.ops.{Curate, TextAnalysis}

/** The stateless curation operators compose with Structured Streaming
  * unchanged: chunking is a pure generator projection and feature
  * hashing aggregates only within a foreachBatch batch, so an arriving
  * corpus can be chunked + featurized incrementally — the streaming
  * ingest half of an embedding/indexing pipeline — with exactly the
  * batch operators, no re-implementation.
  */
class CurateStreamSpec extends SparkSpec {
  import spark.implicits._

  test("chunk + featureHash run per micro-batch over a MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData(1L -> "a b c d e f", 2L -> "x y")
    val out = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("curate-stream-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val chunks = Curate.chunk(batch, "doc_id", "text", size = 4, stride = 2)
        val feats = TextAnalysis.featureHash(batch, "doc_id", "text", dim = 16)
        chunks.groupBy("doc_id").count().collect().foreach { r =>
          val fh = feats.filter(feats("doc_id") === r.getLong(0)).count()
          out.put(r.getLong(0), (r.getLong(1), fh))
        }
        ()
      }
      .start()
    assert(q.awaitTermination(60000), "streaming query did not terminate")
    // doc 1: 6 tokens, stride 2 -> starts 0,2,4 = 3 chunks; doc 2: 1 chunk
    assert(out.get(1L)._1 === 3L)
    assert(out.get(2L)._1 === 1L)
    // feature rows are bounded by distinct tokens (no cross-batch state)
    assert(out.get(1L)._2 >= 1L && out.get(1L)._2 <= 6L)
    assert(out.get(2L)._2 >= 1L && out.get(2L)._2 <= 2L)
  }
}
