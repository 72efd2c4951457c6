package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Token frequency-of-frequencies spectrum: for each occurrence count r,
  * how many distinct vocabulary types occur exactly r times — the
  * Zipf/Good–Turing readout (Gale & Sampson 1995) a corpus-QA pass reads
  * before smoothing or dedup: a healthy natural-language corpus shows
  * n_r ∝ r^(−~2) with a long singleton head; a spike at some large r is
  * the boilerplate signature (one template stamped r times), and a
  * depleted singleton count flags aggressive near-dup collapse.
  *
  * Scale shape: two partial-aggregating shuffles — the (token → tf)
  * count collapses duplicates map-side, then the (tf → type count)
  * spectrum aggregate runs over the vocabulary (≪ corpus) — and the
  * output is bounded by the number of DISTINCT frequencies (≤ O(√N)
  * for any corpus: Σ r·n_r = N bounds how many distinct r can exist).
  * No windows, no joins; the word tokenizer is the oracle-proven
  * [[graft.dedup.Hashing.words]] family.
  */
object FrequencySpectrum {

  /** (freq, n_types): vocabulary types per occurrence count, ascending. */
  def spectrum(docs: DataFrame): DataFrame =
    docs
      .select(explode(Hashing.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .groupBy("freq").agg(count(lit(1)).as("n_types"))

  def spectrumOracleSql(from: String = "documents"): String =
    s"""WITH tok AS (
       |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
       |  FROM $from
       |),
       |tf AS (SELECT w, count(*) AS freq FROM tok WHERE w <> '' GROUP BY w)
       |SELECT freq, count(*) AS n_types FROM tf GROUP BY freq ORDER BY freq""".stripMargin
}
