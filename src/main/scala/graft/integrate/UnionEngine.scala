package graft.integrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One executed union operation, for the validator report. */
case class UnionOp(operation: String, group: String, score: Double, resultRows: Long, resultCols: Int)

/** Union engine: schema matching + vertical concatenation (reference:
  * validator/union.py:19-368, U1-U7 in SURVEY §2.4).
  *
  * All scoring happens on SCHEMAS (driver-side, tiny); the only
  * distributed work is `unionByName` + `dropDuplicates`, which Spark
  * executes as a shuffle-free union followed by one hash-aggregate
  * dedup — the scale-safe shape regardless of frame sizes.
  */
class UnionEngine(config: ValidatorConfig = ValidatorConfig.balanced) {

  /** U2: hybrid column-pair score = 85% difflib name similarity + 15%
    * model probability (trigram stand-in; union.py:84-113). */
  def hybridScore(name1: String, name2: String): Double = {
    val nameSim = NameSimilarity.ratio(name1.toLowerCase.trim, name2.toLowerCase.trim)
    val modelProb = TrigramScorer.probability(name1, name2)
    config.unionNameWeight * nameSim + config.unionModelWeight * modelProb
  }

  /** U3: for each column of B, the best column of A scoring >= the
    * union threshold (union.py:115-148). Multiple B columns may map to
    * the same A column, as in the reference. Returns (mapping b->a,
    * average matched score).
    */
  def findColumnMapping(colsA: Seq[String], colsB: Seq[String]): (Map[String, String], Double) = {
    val mapping = scala.collection.mutable.LinkedHashMap[String, String]()
    val scores = scala.collection.mutable.ArrayBuffer[Double]()
    colsB.foreach { cb =>
      var best: Option[(String, Double)] = None
      colsA.foreach { ca =>
        val s = hybridScore(ca, cb)
        if (s >= config.unionThreshold && best.forall(_._2 < s)) best = Some((ca, s))
      }
      best.foreach { case (ca, s) => mapping(cb) = ca; scores += s }
    }
    (mapping.toMap, if (scores.nonEmpty) scores.sum / scores.size else 0.0)
  }

  /** U4: harmonic-mean coverage of the mapping (union.py:150-167). */
  def coverage(mappingSize: Int, nColsA: Int, nColsB: Int): Double = {
    if (mappingSize == 0) return 0.0
    val ca = if (nColsA > 0) mappingSize.toDouble / nColsA else 0.0
    val cb = if (nColsB > 0) mappingSize.toDouble / nColsB else 0.0
    if (ca + cb == 0) 0.0 else 2 * ca * cb / (ca + cb)
  }

  /** Compatibility check: (compatible, coverage, mapping b->a). */
  def checkCompatibility(df1: DataFrame, df2: DataFrame): (Boolean, Double, Map[String, String]) = {
    val (mapping, _) = findColumnMapping(df1.columns.toSeq, df2.columns.toSeq)
    val cov = coverage(mapping.size, df1.columns.length, df2.columns.length)
    (cov >= config.unionCompatibilityThreshold, cov, mapping)
  }

  /** U5: rename df2 per mapping, align columns (df1's order first,
    * df2-only columns appended in df2 order), vertical concat
    * (union.py:219-264). Dedup happens once per group after all unions
    * (U7), not here.
    */
  def executeUnion(df1: DataFrame, df2: DataFrame, mapping: Map[String, String]): DataFrame = {
    val df2Renamed = df2.columns.foldLeft(df2) { (d, c) =>
      mapping.get(c).fold(d)(target => d.withColumnRenamed(c, target))
    }
    df1.unionByName(df2Renamed, allowMissingColumns = true)
  }

  /** U6+U7: sequential greedy union grouping then per-group exact dedup
    * (union.py:266-368): pop the first frame, absorb every compatible
    * remaining frame into it, repeat.
    */
  def process(dataframes: Seq[DataFrame]): (Seq[DataFrame], Seq[UnionOp]) = {
    if (dataframes.size <= 1) return (dataframes, Nil)
    val operations = scala.collection.mutable.ArrayBuffer[UnionOp]()
    val remaining = scala.collection.mutable.Buffer(dataframes: _*)
    val groups = scala.collection.mutable.ArrayBuffer[DataFrame]()

    while (remaining.nonEmpty) {
      var current = remaining.remove(0)
      val groupName = s"Group${groups.size}"
      var i = 0
      while (i < remaining.size) {
        val next = remaining(i)
        val (compatible, score, mapping) = checkCompatibility(current, next)
        if (compatible) {
          current = executeUnion(current, next, mapping)
          operations += UnionOp("union", groupName, score, -1L, current.columns.length)
          remaining.remove(i)
        } else i += 1
      }
      groups += current
    }
    // U7: exact dedup per group, all columns, keep-first semantics
    // (row identity only — Spark keeps an arbitrary duplicate, which is
    // equivalent because duplicates are exact).
    (groups.map(_.dropDuplicates()).toSeq, operations.toSeq)
  }
}
