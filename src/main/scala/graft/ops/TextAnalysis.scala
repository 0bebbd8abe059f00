package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.Q

/** Text analysis for LLM training-data pipelines (builder-prompt mandate):
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * All row-local expressions (whole-stage codegen, zero shuffles except the
  * output sort) — at 100 TB these run at scan speed with full parallelism.
  * Hashes are md5 (identical lowercase hex in Spark and the oracle).
  */
object TextAnalysis {

  /** tokens = split on non-alphanumeric runs, drop empties (row-local). */
  private val toks =
    "filter(split(text, '[^a-zA-Z0-9]+'), x -> length(x) > 0)"
  private val words =
    "filter(split(text, ' '), x -> length(x) > 0)"

  private val stop = Seq("the", "a", "of", "and", "to")
  private val langWords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "data", "and", "fast"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "la", "les", "des", "et"))

  private def sqlSet(ws: Seq[String]) = ws.map("'" + _ + "'").mkString(", ")

  /** count of words belonging to a marker set (same text in Spark + DuckDB
    * dialects modulo size()/len()). */
  private def score(ws: Seq[String], lenFn: String) =
    s"$lenFn(filter($words, w -> w IN (${sqlSet(ws)})))"
  private def scoreDuck(ws: Seq[String]) =
    s"len(list_filter(list_filter(string_split(text, ' '), x -> length(x) > 0), w -> list_contains([${sqlSet(ws)}], w)))"

  val queries: Map[String, Q] = Map(
    // token counting (whitespace + regex tokenizer, BPE-ish granularity).
    "q_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr(s"size($toks)").as("n_tokens"),
          expr(s"size(array_distinct($toks))").as("n_uniq_tokens"),
          expr(s"size($words)").as("n_words"))
        .orderBy("doc_id")),

    // quality scoring: length / word stats / stopword ratio / alpha ratio.
    "q_quality_score" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          expr(s"size($words)").as("n_words"),
          expr(s"round(CAST(length(text) AS DOUBLE) / size($words), 4)")
            .as("avg_word_len"),
          expr(s"round(CAST(${score(stop, "size")} AS DOUBLE) / size($words), 4)")
            .as("stopword_ratio"),
          expr("round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) AS DOUBLE) / length(text), 4)")
            .as("alpha_ratio"))
        .orderBy("doc_id")),

    // language ID: marker-word scoring per language, argmax with a fixed
    // de<en<es<fr tie order; `correct` compares against the labeled lang.
    "q_lang_id" -> ((s, d) => {
      val scored = Tables.documents(s, d).select(
        (col("doc_id") +: col("lang") +:
          langWords.map { case (l, ws) => expr(score(ws, "size")).as(s"s_$l") }): _*)
      scored.select(col("doc_id"),
          col("s_de"), col("s_en"), col("s_es"), col("s_fr"),
          expr("CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de' " +
            "WHEN s_en >= s_es AND s_en >= s_fr THEN 'en' " +
            "WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END").as("pred"),
          expr("CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de' " +
            "WHEN s_en >= s_es AND s_en >= s_fr THEN 'en' " +
            "WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END" +
            " = lang").as("correct"))
        .orderBy("doc_id")
    }),

    // document fingerprinting: min-hash over rolling 4-char shingles
    // (winnowing-style rolling fingerprint, SURVEY-mandated).
    "q_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("greatest(length(text) - 3, 1)").as("n_shingles"),
          expr("array_min(transform(sequence(1, greatest(length(text) - 3, 1)), i -> md5(substring(text, i, 4))))")
            .as("fp"))
        .orderBy("doc_id"))
  )

  private val duckToks =
    "list_filter(str_split_regex(text, '[^a-zA-Z0-9]+'), x -> length(x) > 0)"
  private val duckWords =
    "list_filter(string_split(text, ' '), x -> length(x) > 0)"

  private val duckCase =
    "CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de' " +
      "WHEN s_en >= s_es AND s_en >= s_fr THEN 'en' " +
      "WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END"

  val oracle: Map[String, String] = Map(
    "q_token_count" ->
      (s"SELECT doc_id, CAST(len($duckToks) AS INTEGER) AS n_tokens, " +
        s"CAST(len(list_distinct($duckToks)) AS INTEGER) AS n_uniq_tokens, " +
        s"CAST(len($duckWords) AS INTEGER) AS n_words " +
        "FROM documents ORDER BY doc_id"),
    "q_quality_score" ->
      (s"SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, " +
        s"CAST(len($duckWords) AS INTEGER) AS n_words, " +
        s"round(CAST(length(text) AS DOUBLE) / len($duckWords), 4) AS avg_word_len, " +
        s"round(CAST(${scoreDuck(stop)} AS DOUBLE) / len($duckWords), 4) AS stopword_ratio, " +
        "round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text), 4) AS alpha_ratio " +
        "FROM documents ORDER BY doc_id"),
    "q_lang_id" ->
      ("WITH scored AS (SELECT doc_id, lang, " +
        langWords.map { case (l, ws) =>
          s"CAST(${scoreDuck(ws)} AS INTEGER) AS s_$l" }.mkString(", ") +
        " FROM documents) " +
        s"SELECT doc_id, s_de, s_en, s_es, s_fr, $duckCase AS pred, " +
        s"($duckCase) = lang AS correct FROM scored ORDER BY doc_id"),
    "q_fingerprint" ->
      ("SELECT doc_id, n_shingles, " +
        "min(md5(substr(text, CAST(i AS INTEGER), 4))) AS fp FROM " +
        "(SELECT doc_id, text, CAST(greatest(length(text) - 3, 1) AS INTEGER) AS n_shingles, " +
        "unnest(generate_series(1, greatest(length(text) - 3, 1))) AS i FROM documents) " +
        "GROUP BY doc_id, n_shingles ORDER BY doc_id")
  )
}
