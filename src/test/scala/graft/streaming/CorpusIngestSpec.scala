package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.{AnnIndex, DedupIndex}
import graft.streaming.StreamingDedupIngest.stage

/** The joint text+vector coordinator ([[StreamingCorpusIngest]]):
  * the cross-family invariant — searchable vectors ≡ trainable
  * documents — under gating, crash windows between the halves of a
  * joint takedown, readmits (which land below the sync mark and so
  * exercise the repair path, not the delta path), and replays. */
class CorpusIngestSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")
    .select("doc_id", "text").localCheckpoint()
  private def embs = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select($"vec_id".as("doc_id"), $"embedding").localCheckpoint()
  private def ids(df: org.apache.spark.sql.DataFrame,
                  col: String = "doc_id") =
    df.select(col).as[Long].collect().toSet

  /** Embeddings relation that also covers near-dup copy ids
    * (doc_id+20000 for doc_id<30) so readmitted copies can sync. */
  private def embsWithCopies = {
    val base = embs
    base.unionByName(base.filter($"doc_id" < 30)
      .select(($"doc_id" + 20000L).as("doc_id"), $"embedding"))
      .localCheckpoint()
  }

  test("joint ingest: gate verdicts bind the vector side; quarantined " +
      "embeddings are never searchable") {
    val root = Files.createTempDirectory("graft_joint_").toString
    val joint = new StreamingCorpusIngest(spark, root)
    val e = embsWithCopies

    joint.seed(docs.filter($"doc_id" < 200), e)
    assert(joint.alignment().isEmpty, "seed must leave both aligned")
    assert(ids(joint.vectors.store(), "vec_id") ==
      ids(joint.text.corpus()))

    // drop: 50 new docs + 30 exact copies (the gate quarantines them)
    val drop = docs.filter($"doc_id" >= 200 && $"doc_id" < 250)
      .unionByName(docs.filter($"doc_id" < 30)
        .select(($"doc_id" + 20000L).as("doc_id"), $"text"))
    stage(drop, s"$root/staging", "d1")
    joint.ingestAvailable(s"$root/staging", s"$root/ckpt", e)

    val corpus = ids(joint.text.corpus())
    assert(corpus.contains(200L) && !corpus.contains(20000L),
      "gate must accept new docs and quarantine the copies")
    // the quarantined copies' embeddings must NOT be searchable:
    // absent from the store AND from the live ANN index
    val store = ids(joint.vectors.store(), "vec_id")
    assert(store == corpus, "vector store must mirror the corpus")
    assert(!ids(AnnIndex.liveIndexedIds(spark, s"$root/ann_index"),
      "id").exists(_ >= 20000L))
    assert(joint.alignment().isEmpty)

    // a replayed sync is a no-op (mark + ANN already-indexed gate)
    joint.syncVectors(e)
    assert(ids(joint.vectors.store(), "vec_id") == store)

    // joint takedown reaches both families + both ledgers
    joint.retract(Seq(5L, 210L).toDF("doc_id"))
    val after = ids(joint.text.corpus())
    assert(!after.contains(5L) && !after.contains(210L))
    assert(ids(joint.vectors.store(), "vec_id") == after)
    assert(!ids(AnnIndex.liveIndexedIds(spark, s"$root/ann_index"),
      "id").contains(5L))
    assert(!ids(DedupIndex.liveIndexedIds(spark, s"$root/dedup_index"),
      "id").contains(5L))
    assert(joint.alignment().isEmpty)

    // readmit two quarantined copies: original-batch re-entry is
    // below the sync mark — only the repair path can admit their
    // vectors, and readmit() routes through it
    joint.readmit(Seq(20000L, 20001L).toDF("doc_id"), e)
    val readmitted = ids(joint.text.corpus())
    assert(readmitted.contains(20000L) && readmitted.contains(20001L))
    assert(ids(joint.vectors.store(), "vec_id") == readmitted,
      "readmitted docs' vectors must be admitted via repair")
    assert(ids(AnnIndex.liveIndexedIds(spark, s"$root/ann_index"),
      "id").contains(20000L))
    assert(joint.alignment().isEmpty)

    // health: both families' frames, prefixed, in one plan
    val h = joint.health().as[(String, Double)].collect().toMap
    assert(h.keys.exists(_.startsWith("text_")) &&
      h.keys.exists(_.startsWith("ann_")))
    assert(h("ann_store_rows") == readmitted.size.toDouble)
  }

  test("crash between the halves of a joint retract: text ledgered, " +
      "vectors still live — repairAlignment finishes the takedown") {
    val root = Files.createTempDirectory("graft_jcrash_").toString
    val joint = new StreamingCorpusIngest(spark, root)
    joint.seed(docs.filter($"doc_id" < 150), embs)

    // simulate the crash: only the text half runs
    joint.text.retract(Seq(7L, 8L).toDF("doc_id"))
    val aud = joint.alignment()
      .as[(String, Long)].collect().toSet
    assert(aud == Set(("vectors_only", 7L), ("vectors_only", 8L)),
      "audit must surface the half-applied takedown")

    joint.repairAlignment(embs)
    assert(joint.alignment().isEmpty)
    assert(!ids(joint.vectors.store(), "vec_id").contains(7L))
    // the vector-side ledger now holds the ids too: re-delivery of
    // the retracted vectors through the ANN stream stays out
    stage(embs.filter($"doc_id" < 10)
        .select($"doc_id".as("vec_id"), $"embedding"),
      s"$root/ann_staging", "redeliver")
    joint.vectors.ingestAvailable(s"$root/ann_staging", s"$root/ann_ckpt")
    assert(!ids(joint.vectors.store(), "vec_id").contains(7L),
      "re-delivered retracted vector must stay out (sticky ledger)")
    assert(joint.alignment().isEmpty)
  }

  test("missed sync converges through repairAlignment; absent " +
      "embedding rows fail loudly") {
    val root = Files.createTempDirectory("graft_jrepair_").toString
    val joint = new StreamingCorpusIngest(spark, root)
    // build text-side state behind the coordinator's back (a missed
    // sync): seed through the text half directly
    joint.text.seed(docs.filter($"doc_id" < 120))
    assert(ids(joint.alignment().filter($"side" === "corpus_only"))
      == ids(docs.filter($"doc_id" < 120)))

    // loud on a gap in the embeddings relation
    val holey = embs.filter($"doc_id" =!= 5L)
    val ex = intercept[IllegalArgumentException] {
      joint.repairAlignment(holey)
    }
    assert(ex.getMessage.contains("no embedding row"))

    joint.repairAlignment(embs)
    assert(joint.alignment().isEmpty)
    assert(ids(joint.vectors.store(), "vec_id") ==
      ids(joint.text.corpus()))
    // repair is idempotent
    joint.repairAlignment(embs)
    assert(joint.alignment().isEmpty)
  }
}
