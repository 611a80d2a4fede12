package graft.text

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, RegexTokenizer, SQLTransformer, StopWordsRemover}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's notes→bag-of-words featurization (M1/E16,
  * Hap880_Final_Project.py:287-314) as an `ml.Pipeline`:
  *
  *   clean (builtin exprs) → RegexTokenizer(\W+) → StopWordsRemover →
  *   lemmatize (UDF over the token array) → CountVectorizer(vocabSize)
  *
  * Output is a `SparseVector` column — the 45,076×3,000 matrix stays
  * sparse and distributed; the reference densified only because pandas
  * lacks a vector type (SURVEY §1.1). `CountVectorizer.fit` is the one
  * stage with a shuffle (distinct-term counts + TakeOrdered(vocabSize)).
  */
object TextFeaturizer {

  /** UDF form kept for comparison/testing; the pipeline uses the native
    * `LemmatizeAll` Catalyst expression (codegen'd, no serialization
    * boundary — see graft.expr.LemmatizeExpression).
    */
  val lemmatizeTokens = udf { toks: Seq[String] => Lemmatizer.lemmatize(toks) }

  /** Pre-tokenization scrub: lowercase, strip newlines/punct/digits
    * (reference preprocess_text, py:287-294 — builtin composition, no UDF).
    */
  def clean(df: DataFrame, inputCol: String, outputCol: String): DataFrame =
    df.withColumn(outputCol, TextOps.normalize(col(inputCol)))

  /** Fit the tokenize→stopword→lemmatize→count pipeline. The lemmatizer
    * stage rides a SQLTransformer-free UDF wrapper via `transform` below
    * (ml.Pipeline needs Transformer stages; we keep lemmatization outside
    * the Pipeline object and feed CountVectorizer the final tokens).
    */
  def fit(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int = 3000,
      extraStopwords: Seq[String] = Nil
  ): (DataFrame => DataFrame, CountVectorizerModel) = {
    val prepared = prepare(docs, textCol, extraStopwords)
    val cv = new CountVectorizer()
      .setInputCol("lemmas").setOutputCol("tf").setVocabSize(vocabSize)
    val model = cv.fit(prepared)
    val transformer = (df: DataFrame) => model.transform(prepare(df, textCol, extraStopwords))
    (transformer, model)
  }

  /** DuckDB oracle for the UNCAPPED vocabulary of [[fit]]: with
    * `vocabSize ≥ |distinct terms|` (and CountVectorizer's default
    * minDF=1) the vocabulary SET is exactly "distinct lemmas of kept
    * tokens" — order-free, so the full clean→tokenize→stopword→lemmatize
    * pipeline becomes hash-checkable. The stopword list is embedded from
    * the SAME runtime constant the StopWordsRemover stage uses, and the
    * lemma rules render via [[Lemmatizer.lemmaCaseSql]]. (The capped
    * vocabSize=3000 production path stays rows-only: its cut boundary
    * depends on model-internal tie order.)
    */
  def vocabularyOracleSql(table: String, textCol: String): String = {
    val stop = StopWordsRemover.loadDefaultStopWords("english")
      .map(w => s"'${w.toLowerCase.replace("'", "''")}'").mkString("[", ",", "]")
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(regexp_split_to_array(lower($textCol), '[^a-z]+'), x -> x <> '')) AS tok
       |  FROM $table
       |), kept AS (
       |  SELECT tok FROM toks WHERE NOT list_contains($stop, tok)
       |)
       |SELECT DISTINCT ${Lemmatizer.lemmaCaseSql("tok")} AS term FROM kept""".stripMargin
  }

  /** clean → tokenize → stopword-remove → lemmatize, as a DataFrame map. */
  def prepare(docs: DataFrame, textCol: String, extraStopwords: Seq[String] = Nil): DataFrame = {
    val tokenizer = new RegexTokenizer()
      .setInputCol("_clean").setOutputCol("_toks")
      .setPattern("[^a-z]+").setToLowercase(true).setMinTokenLength(1)
    val remover = new StopWordsRemover()
      .setInputCol("_toks").setOutputCol("_kept")
      .setStopWords((StopWordsRemover.loadDefaultStopWords("english") ++ extraStopwords).toArray)
    val cleaned = clean(docs, textCol, "_clean")
    remover
      .transform(tokenizer.transform(cleaned))
      .withColumn("lemmas", graft.functions.GraftFunctions.lemmatize_all(col("_kept")))
      .drop("_clean", "_toks", "_kept")
  }
}
