package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination (SURVEY §2.12 extension surface): remove
  * training documents that share any token n-gram with a held-out
  * benchmark/eval corpus — the standard guard against test-set leakage
  * into a pretraining mix (the "13-gram overlap" rule of GPT-3/PaLM
  * lineage, parameterized here).
  *
  * Scale shape: the eval side is benchmarks — thousands of documents,
  * millions of distinct n-grams — so its distinct gram set broadcasts.
  * The training corpus (the 100 TB side) streams once: generate grams,
  * broadcast-hash semi-join, aggregate doc ids. No slab of exploded
  * training grams is ever shuffled or materialized; the whole pass is
  * scan → generate → broadcast probe → partial distinct.
  */
object Decontaminate {

  /** Distinct n-gram strings of the eval corpus (the broadcast side). */
  def evalGrams(eval: DataFrame, textCol: String, n: Int): DataFrame =
    eval.select(explode(TextAnalysis.tokenNgrams(col(textCol), n)).as("gram")).distinct()

  /** Ids of training docs sharing ≥1 token n-gram with the eval set. */
  def contaminatedIds(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame =
    train.select(col(idCol), explode(TextAnalysis.tokenNgrams(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams(eval, textCol, n)), Seq("gram"), "left_semi")
      .select(idCol).distinct()

  /** The decontaminated training corpus: `train` minus every document
    * overlapping the eval set.
    */
  def removeContaminated(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame =
    train.join(contaminatedIds(train, eval, idCol, textCol, n), Seq(idCol), "left_anti")

  /** Bloom-filter variant for when the eval gram set outgrows an exact
    * broadcast (a many-benchmark suite at small n): probe a bloom
    * filter of the eval grams instead of hash-joining them. One-sided
    * error in the SAFE direction — no false negatives, so every truly
    * contaminated doc is flagged; `fpp` controls how much clean data
    * is over-dropped (spec'd as a superset of the exact ids). The
    * probe is a UDF by necessity: Spark's bloom machinery
    * (`BloomFilterAggregate`/`BloomFilterMightContain`) is internal to
    * runtime join filtering and NOT registered on the public surface
    * (verified on 4.1: `might_contain` is UNRESOLVED_ROUTINE), and a
    * broadcast sketch has no canonicalization-stable literal form —
    * so the UDF stays, confined to the gram stream, and deliberately
    * feeds no CacheLifecycle persist (PersistStabilitySpec would
    * catch it if it ever did).
    */
  def contaminatedIdsBloom(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      fpp: Double = 0.01): DataFrame = {
    val grams = evalGrams(eval, textCol, n).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bf = grams.stat.bloomFilter("gram", math.max(grams.count(), 1L), fpp)
    grams.unpersist()
    val bc = train.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((g: String) => g != null && bc.value.mightContainString(g))
    train.select(col(idCol), explode(TextAnalysis.tokenNgrams(col(textCol), n)).as("gram"))
      .filter(mightContain(col("gram")))
      .select(idCol).distinct()
  }
}
