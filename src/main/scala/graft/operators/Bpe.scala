package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.Staging

/** Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
  * 2016), the LLM-pipeline step after cleaning/dedup: learn the
  * highest-count adjacent symbol merges over the corpus word
  * distribution, then encode text by the learned vocabulary. The
  * reference pipeline stores documents but never tokenizes
  * (/root/reference/stores/file_store.py); this is the training-data
  * side every 100 TB corpus needs.
  *
  * Representation: a word is its character symbols plus a final `_`
  * end-of-word marker, carried as ONE delimiter string
  * `||s1||s2||...||sk||` (every boundary exactly `||`, both ends
  * included; symbols never contain `|`). Merging pair (A, B) is then a
  * single engine-native `replace(s, "|A||B|", "|AB|")`: the pattern
  * claims the INNER half of each boundary, so the leftover outer `|`
  * re-forms a full boundary with both neighbours and one left-to-right
  * non-overlapping replace() pass merges every occurrence — including
  * adjacent ones (`||a||b||a||b||` → `||ab||ab||` in one call) — with
  * the same greedy-scan semantics as the classic list-walk BPE merge.
  * Spark's `replace` and DuckDB's `replace` share this contract, which
  * is what makes the oracle exact.
  *
  * Scale shape: training runs over the DISTINCT word table (bounded by
  * Heaps' law — millions of rows at 100 TB, not trillions), weighted by
  * corpus counts from one map-side-combined aggregation over the
  * documents. Each round is two small jobs over the staged word table
  * (pair count + argmax) and a projection; encoding is a broadcast join
  * of tokens against the final word→symbols table. Counts stay in
  * Int64: a pair count is ≤ total corpus tokens, so no overflow below
  * ~9·10^18 tokens.
  */
object Bpe {

  /** Distinct words of the corpus with counts and the initial symbol
    * string (chars + `_` marker, `||`-delimited). */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"),
        concat(lit("||"),
          array_join(concat(split(col("word"), ""), array(lit("_"))), "||"),
          lit("||")).as("s"))

  /** Adjacent symbol pairs of each word, weighted by word count:
    * (lhs, rhs, c = Σ cnt over occurrences). */
  private def pairCounts(words: DataFrame): DataFrame = {
    val arr = split(trim(col("s"), "|"), "\\|\\|")
    words.select(col("cnt"), arr.as("_arr"))
      .select(col("cnt"),
        explode(zip_with(
          slice(col("_arr"), lit(1), size(col("_arr")) - 1),
          slice(col("_arr"), lit(2), size(col("_arr")) - 1),
          (l, r) => struct(l.as("lhs"), r.as("rhs")))).as("_p"))
      .groupBy(col("_p.lhs").as("lhs"), col("_p.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("c"))
  }

  /** `nMerges` BPE rounds. Returns (merges, finalWords):
    * merges = (step, lhs, rhs, pair_cnt) one row per executed round;
    * finalWords = (word, cnt, s) with all merges applied. A round with
    * no pairs left merges nothing (its best-pair frame is empty and the
    * left join keeps every word unchanged) — mirrored by the oracle's
    * empty-CTE UNION. */
  def learn(docs: DataFrame, textCol: String, nMerges: Int): (DataFrame, DataFrame) = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    var words = Staging.stage(wordTable(docs, textCol), "bpe_w0")
    var merges: Option[DataFrame] = None
    for (step <- 1 to nMerges) {
      // argmax pair, ties to (lhs, rhs) ascending — the cross-engine rule
      val best = pairCounts(words)
        .orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(1)
      val stepRow = best.select(lit(step).as("step"), col("lhs"), col("rhs"),
        col("c").as("pair_cnt"))
      merges = Some(merges.fold(stepRow)(_.unionByName(stepRow)))
      val merged = words.join(broadcast(best), lit(true), "left")
        .select(col("word"), col("cnt"),
          when(col("lhs").isNull, col("s")).otherwise(
            call_function("replace", col("s"),
              concat(lit("|"), col("lhs"), lit("||"), col("rhs"), lit("|")),
              concat(lit("|"), col("lhs"), col("rhs"), lit("|")))).as("s"))
      words = Staging.stage(merged, s"bpe_w$step")
    }
    (merges.get.orderBy("step"), words)
  }

  /** Encode: per-doc BPE token count by joining corpus tokens against
    * the final word→symbols table (broadcast — the vocab is the small
    * side by construction). */
  def encode(docs: DataFrame, idCol: String, textCol: String, finalWords: DataFrame): DataFrame = {
    val vocab = finalWords.select(col("word"),
      size(split(trim(col("s"), "|"), "\\|\\|")).cast("long").as("_nsym"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .join(broadcast(vocab), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("_nsym")).as("n_bpe_tokens"))
  }
}
