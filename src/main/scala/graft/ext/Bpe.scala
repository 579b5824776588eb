package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training over the corpus — learn the merge table, the
  * step a training-data pipeline runs BEFORE any token counting means
  * anything. The classic algorithm (Sennrich et al.): start from
  * characters, repeatedly merge the most frequent adjacent symbol pair.
  *
  * 100 TB shape: the corpus-sized work is exactly ONE pass — the word
  * frequency count (tokens shuffle once, partial-aggregated). Every
  * merge iteration after that runs on the WORD VOCABULARY (≪ corpus:
  * frequencies stand in for the corpus), as one pair-count aggregate +
  * one per-row symbol rewrite — the same driver-loop-over-small-frames
  * shape as [[Dedup.connectedComponents]]. Iterations re-pin the vocab
  * frame and release the previous pin, so the loop holds one
  * vocab-sized frame at a time.
  *
  * Determinism: the winning pair is (max summed frequency, then
  * lexicographic (left, right)) — total order, no hash iteration
  * anywhere; greedy left-to-right application (the fold below) is the
  * standard BPE rule, so "aaa" under merge (a,a) becomes [aa, a].
  */
object Bpe {

  /** Greedy left-to-right application of merge (a, b) to a symbol
    * array, as a pure fold expression.
    */
  private def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Learn up to `nMerges` BPE merges from the corpus' whitespace
    * words. Returns the ordered merge table — (left, right) pairs, the
    * artifact a tokenizer ships.
    */
  def trainMerges(docs: DataFrame, nMerges: Int,
                  textCol: String = "text"): Seq[(String, String)] = {
    require(nMerges >= 1, "need at least one merge")
    // the one corpus-sized pass: word frequencies, words as char symbols
    var vocab = graft.std.Materialize.pinUnregistered(
      docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .select(col("freq"),
          filter(split(col("word"), ""), s => s =!= "").as("syms")))
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    try {
      var i = 0
      var exhausted = false
      while (i < nMerges && !exhausted) {
        // frequency-weighted adjacent-pair counts over the vocabulary
        val best = vocab
          // greatest(.., 0): an empty/whitespace-only document yields
          // word "" with ZERO symbols, and slice rejects length -1 at
          // runtime — empty arrays must contribute no pairs, not crash
          .select(col("freq"), explode(zip_with(
            slice(col("syms"), lit(1),
              greatest(size(col("syms")) - 1, lit(0))),
            slice(col("syms"), lit(2),
              greatest(size(col("syms")) - 1, lit(0))),
            (x, y) => struct(x.as("l"), y.as("r")))).as("p"))
          .groupBy(col("p.l"), col("p.r"))
          .agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("l").asc, col("r").asc)
          .head(1)
        if (best.isEmpty) exhausted = true
        else {
          val (l, r) = (best(0).getString(0), best(0).getString(1))
          merges += ((l, r))
          val next = graft.std.Materialize.pinUnregistered(
            vocab.select(col("freq"), mergePair(col("syms"), l, r).as("syms")))
          graft.std.Materialize.releasePin(vocab)
          vocab = next
          i += 1
        }
      }
      merges.toList
    } finally graft.std.Materialize.releasePin(vocab)
  }

  /** Apply a learned merge table to a token column — chars → learned
    * subword units, the encode step (per-row expression chain, one
    * fold per merge; fine for merge tables of demo size, a production
    * encoder compiles the table into a trie).
    */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(filter(split(word, ""), s => s =!= "")) {
      case (syms, (a, b)) => mergePair(syms, a, b)
    }
}
