package graft.llmdata

import graft.SparkSpec

class PersistPolicySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 50L)
    .map(i => (i, s"some text for document $i")).toDF("doc_id", "text")

  test("below the gate the frame is persisted; above it (gate=0) it is not") {
    val docs = corpus
    val frame = docs.selectExpr("doc_id", "explode(split(text, ' ')) AS t")
    try {
      spark.conf.set(PersistPolicy.confKey, Long.MaxValue.toString)
      val cached = PersistPolicy.persistGated(frame, docs)
      assert(cached.storageLevel.useMemory, "under the gate => persisted")
      cached.unpersist()
      spark.conf.set(PersistPolicy.confKey, "0")
      val plain = PersistPolicy.persistGated(frame, docs)
      assert(!plain.storageLevel.useMemory
        && !plain.storageLevel.useDisk, "gate 0 => recompute path")
      plain.unpersist() // caller-release contract: a no-op here
    } finally spark.conf.unset(PersistPolicy.confKey)
  }

  test("results are identical on both sides of the gate") {
    val docs = corpus.union(corpus.filter($"doc_id" % 5 === 0)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text"))
    // rides the gated sketch persist (the policy's flagship site)
    def run(): Seq[(Long, Long)] = Dedup.verifiedNearDups(Dedup.sketch(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    try {
      spark.conf.set(PersistPolicy.confKey, Long.MaxValue.toString)
      val below = run()
      spark.conf.set(PersistPolicy.confKey, "0")
      val above = run()
      assert(below == above)
    } finally spark.conf.unset(PersistPolicy.confKey)
  }
}
