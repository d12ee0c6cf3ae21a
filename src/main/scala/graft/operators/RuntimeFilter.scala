package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime-filter join pruning: build a Bloom filter over the join
  * keys of a (filtered, therefore small) dimension side and apply it
  * to the fact side BEFORE the shuffle, so pruned fact rows never
  * serialize, never ship, and never sort.
  *
  * This is the explicit form of Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` injection. The explicit
  * operator exists because (a) the injected form only fires under
  * cost heuristics a pipeline author may want to override, and (b)
  * the 100 TB win — a 0.1%-selective dim pruning a full fact scan's
  * shuffle — is too large to leave to chance.
  *
  * Correctness does not depend on the sketch: the Bloom filter only
  * ever FALSELY KEEPS rows (fpp), never drops a matching one, and
  * the exact join that follows removes false positives. The gate
  * oracle is therefore the plain join SQL.
  */
object RuntimeFilter {
  /** Inner-join `fact` to `dim` on `factKey == dimKey`, pre-pruning
    * the fact side with a Bloom filter of the dim keys.
    *
    * The dim pass that builds the filter is a distributed aggregate
    * (`stat.bloomFilter`) whose result is sketch-sized (~1.2 MB at
    * 1M items / 1% fpp) regardless of fact size; it broadcasts to
    * every fact task. `expectedItems` sizes the bit array — oversize
    * is wasted broadcast bytes, undersize degrades fpp (never
    * correctness). The membership probe is a native codegen'd
    * expression on a LONG key (graft.functions.BloomProbeExpr — no
    * per-row boxing, no lambda dispatch, stays inside whole-stage
    * codegen); the fact's wide payload columns are untouched until
    * after pruning. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedItems: Long = 1000000L,
                      fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    fact.filter(col(factKey).isNotNull &&
        graft.functions.GraftFunctions.bloom_might_contain(bf, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
