package graft.operators

import graft.{Num, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token
  * statistics, quality scoring, language identification, and content
  * fingerprinting. All are single-scan, per-row expression pipelines —
  * embarrassingly parallel, no shuffle except the final aggregates —
  * which is exactly the shape that keeps them scan-bound at 100 TB.
  *
  * Every query here has a full DuckDB oracle: the scoring formulas are
  * written in engine-portable primitives (regex-free token splits,
  * integer encodings for argmax tie-breaks, modular-arithmetic
  * fingerprints) so both engines agree exactly.
  */
object TextAnalysis extends QueryModule {
  import Tables._
  import Num._

  /** Non-empty whitespace tokens — identical semantics both engines. */
  private val toksExpr = "filter(split(text, '\\\\s+'), t -> t != '')"

  private val stopwords =
    Seq("the", "and", "of", "to", "a", "in", "is", "it")

  /** Marker vocabularies for the language-ID heuristic. Priority codes
    * break score ties deterministically (higher code wins; en default).
    */
  private val langMarkers: Seq[(String, Int, Seq[String])] = Seq(
    ("en", 7, Seq("the", "and", "of", "to", "in", "is")),
    ("de", 3, Seq("der", "die", "das", "und", "ist", "nicht")),
    ("es", 2, Seq("el", "la", "los", "que", "por", "con")),
    ("fr", 1, Seq("le", "les", "des", "est", "que", "une")),
    ("zh", 0, Seq("de", "shi", "bu", "zai", "you", "wo")))

  private def sqlToks = "list_filter(string_split_regex(text, '\\s+'), t -> t != '')"

  override def queries: Map[String, Q] = Map(
    // Token statistics per document + corpus rollup.
    "text_token_stats" -> ((s, d) => {
      documents(s, d)
        .withColumn("toks", expr(toksExpr))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_chars_m", length(col("text")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          davg(col("n_tokens").cast("double")).as("avg_tokens"),
          max(col("n_chars_m")).cast("long").as("max_chars"))
        .orderBy(col("lang"))
    }),

    // Quality scoring: stopword ratio, mean token length, digit ratio.
    "text_quality" -> ((s, d) => {
      documents(s, d)
        .withColumn("toks", expr(toksExpr))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_stop", size(expr(
          s"filter(toks, t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")}))")))
        .withColumn("n_digit", length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", "")))
        .withColumn("stop_ratio",
          col("n_stop").cast("double") / col("n_tokens"))
        .withColumn("digit_ratio",
          col("n_digit").cast("double") / length(col("text")))
        .withColumn("quality_bucket",
          when(col("n_tokens") < 10, "too_short")
            .when(col("stop_ratio") > 0.5, "boilerplate")
            .otherwise("ok"))
        .select(col("doc_id"), col("n_tokens"), col("n_stop"),
          col("stop_ratio"), col("digit_ratio"), col("quality_bucket"))
        .orderBy(col("doc_id"))
    }),

    // Language-ID heuristic: marker-word hit counts per language,
    // argmax via integer packing (score*8 + priority) so ties break
    // identically in both engines. Output is the lang × predicted
    // confusion matrix.
    "text_langid" -> ((s, d) => {
      val scored = langMarkers.foldLeft(
        documents(s, d).withColumn("toks", expr(toksExpr))) {
        case (df, (name, _, markers)) =>
          df.withColumn(s"s_$name", size(expr(
            s"filter(toks, t -> t IN (${markers.map("'" + _ + "'").mkString(",")}))")))
      }
      val packed = langMarkers.map { case (name, code, _) =>
        col(s"s_$name") * 8 + lit(code)
      }
      val codeToLang = langMarkers.map { case (name, code, _) =>
        (code, name)
      }
      val predicted = codeToLang.tail.foldLeft(
        when(greatest(packed: _*) % 8 === codeToLang.head._1,
          lit(codeToLang.head._2))) { case (acc, (code, name)) =>
        acc.when(greatest(packed: _*) % 8 === code, lit(name))
      }
      scored
        .withColumn("predicted", predicted)
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    }),

    // Karp-Rabin content fingerprint: sequential modular fold over
    // character codes (base 257 mod 1e9+7). Order-dependent by design
    // — it IS the document identity — and exactly portable because
    // all arithmetic is integer.
    "text_fingerprint" -> ((s, d) => {
      documents(s, d)
        .withColumn("fp", expr(
          "aggregate(transform(sequence(1, length(text))," +
            " i -> ascii(substring(text, i, 1)))," +
            " 0L, (acc, c) -> (acc * 257 + c) % 1000000007)"))
        .select(col("doc_id"), col("fp"))
        .orderBy(col("doc_id"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "text_token_stats" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len($sqlToks)) AS BIGINT) AS total_tokens,
         |  ${sqlAvg(s"CAST(len($sqlToks) AS DOUBLE)")} AS avg_tokens,
         |  MAX(len(text)) AS max_chars
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, $sqlToks AS toks FROM documents)
         |SELECT doc_id, len(toks) AS n_tokens,
         |  len(list_filter(toks, t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")})))
         |    AS n_stop,
         |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
         |  CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
         |    AS DOUBLE) / len(text) AS digit_ratio,
         |  CASE WHEN len(toks) < 10 THEN 'too_short'
         |       WHEN CAST(n_stop AS DOUBLE) / n_tokens > 0.5 THEN 'boilerplate'
         |       ELSE 'ok' END AS quality_bucket
         |FROM t ORDER BY doc_id""".stripMargin,

    "text_langid" -> {
      val scores = langMarkers.map { case (name, _, markers) =>
        s"len(list_filter(toks, t -> t IN (${markers.map("'" + _ + "'").mkString(",")}))) AS s_$name"
      }.mkString(",\n  ")
      val packed = langMarkers.map { case (name, code, _) =>
        s"s_$name * 8 + $code"
      }.mkString(", ")
      val cases = langMarkers.map { case (name, code, _) =>
        s"WHEN greatest($packed) % 8 = $code THEN '$name'"
      }.mkString(" ")
      s"""WITH t AS (SELECT lang, $sqlToks AS toks FROM documents),
         |s AS (SELECT lang, $scores FROM t)
         |SELECT lang, CASE $cases END AS predicted, COUNT(*) AS n
         |FROM s GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin
    },

    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, len(text) + 1),
        |        i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))),
        |    (acc, c) -> (acc * 257 + c) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
