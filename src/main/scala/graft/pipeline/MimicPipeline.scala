package graft.pipeline

import graft.sources.MimicSynth
import org.apache.spark.ml.feature.{CountVectorizerModel, Tokenizer, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's §3 modeling pipeline at ITS OWN published scale,
  * composed over the MIMIC-shaped synthetic tables: the 45,059 × 3,019
  * feature matrix (3,000 bag-of-words + 17 diagnosis-category counts +
  * age + gender — the reference's "final numeric feature table 45,059 ×
  * 3,019", BASELINE.md), the tuned 36,047/9,012 split, and the L1-LR
  * training surface the reference benchmarks (its ONLY published
  * wall-clock numbers are GridSearchCV fits on exactly this matrix).
  *
  * Scale shape: the matrix build is one token explode + CountVectorizer
  * fit (two corpus passes), one diagnosis hash-agg, broadcast-size
  * patient joins; assembled once per session (the [[graft.ml.Features]]
  * memo contract) because every training query starts from this frame.
  */
object MimicPipeline {

  /** The 17 distinct ICD-9 category names (18 ranges, 'misc' twice). */
  val diagCats: Seq[String] =
    graft.SparkEntry.icd9Ranges.map(_._3).distinct

  private val memo =
    new java.util.WeakHashMap[SparkSession, (DataFrame, Array[String])]()

  /** The matrix's top-3000 vocabulary IN SLOT ORDER (slot i of the
    * assembled features vector is word i; slots 3000..3016 are
    * [[diagCats]], 3017 age, 3018 gender_m).
    */
  def vocabulary(s: SparkSession): Array[String] = {
    assembled(s); memo.synchronized(memo.get(s)._2)
  }

  /** (HADM_ID, label, split, features) with features of width 3,019. */
  def assembled(s: SparkSession): DataFrame = memo.synchronized {
    val cur = memo.get(s)
    if (cur != null) cur._1
    else {
      val (out, vocab) = build(s, 1L)
      memo.put(s, (out, vocab))
      out
    }
  }

  /** The matrix build at `f`× MIMIC scale — NOT memoized (the Scale
    * harness times one build and unpersists the result; production
    * sessions use [[assembled]]). Returned frame is persisted and
    * materialized, like [[assembled]]'s.
    */
  def assembledAt(s: SparkSession, f: Long): DataFrame = build(s, f)._1

  private def build(s: SparkSession, f: Long): (DataFrame, Array[String]) = {
    {
      val rows = MimicSynth.modelingRowsAt(s, f)
      val notes = MimicSynth.notesAt(s, f)
        .filter(col("CATEGORY") === "Discharge summary")
        .select(col("HADM_ID"), col("TEXT"))
      // missing-note rows stay in the matrix as all-zero text (the
      // reference's fillna(' '))
      // tokenize ONCE and pin the token frame: synthetic TEXT generation
      // (per-word hash draws) is the build's cost center, and the vocab
      // count + the CountVectorizerModel transform + the assembler pass
      // would each regenerate it (~20 s/pass cold). The pinned frame is
      // |cohort| rows of ~35-token arrays — trivially memory-resident —
      // and is released as soon as the assembled matrix is materialized.
      // At 100 TB the same shape holds: one corpus scan, token arrays
      // shuffled nowhere, downstream passes read the columnar cache.
      val toksed = new Tokenizer().setInputCol("TEXT").setOutputCol("_toks")
        .transform(rows.join(notes, Seq("HADM_ID"), "left")
          .na.fill(" ", Seq("TEXT")))
        .drop("TEXT")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // deterministic top-3000 vocabulary (count desc, word asc — the
      // SAME tie-break the oracled mimic_notes_vocab query pins):
      // CountVectorizer.fit orders by frequency only, so ties at the cut
      // boundary would make the matrix content session-dependent. The cut
      // is computed distributed and only the 3,000 winners are collected.
      val vocab = toksed
        .select(explode(col("_toks")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("_c"))
        .orderBy(desc("_c"), asc("word")).limit(3000)
        .collect().map(_.getString(0))
      val bowed = new CountVectorizerModel(vocab)
        .setInputCol("_toks").setOutputCol("_bow")
        .transform(toksed)
      // 17 per-admission diagnosis-category counts (explicit sums — no
      // pivot distinct-values pre-job)
      val dg = MimicSynth.diagnosesAt(s, f)
      val code3 = coalesce(
        when(col("ICD9_CODE").rlike("[A-Za-z]"), lit(999))
          .otherwise(substring(col("ICD9_CODE"), 1, 3).cast("int")),
        lit(999))
      val catCols = diagCats.map(c =>
        sum(when(col("cat") === c, 1.0).otherwise(0.0)).as(s"diag_$c"))
      val cats = dg.withColumn("cat", graft.SparkEntry.icd9Category(code3))
        .groupBy("HADM_ID")
        .agg(catCols.head, catCols.tail: _*)
      val pat = MimicSynth.patientsAt(s, f)
      val admMin = MimicSynth.admissionsAt(s, f)
        .groupBy("SUBJECT_ID").agg(min("ADMITTIME").as("_admit_min"))
      val aged = bowed
        .join(cats, Seq("HADM_ID"))
        .join(admMin, Seq("SUBJECT_ID"))
        .join(pat, Seq("SUBJECT_ID"))
        .withColumn("_age_raw",
          floor(graft.ops.CohortOps.fractionalDays(col("_admit_min"), col("DOB")) / 365.0))
        .withColumn("age",
          when(col("_age_raw") > 89 || col("_age_raw") < 0, 90.0)
            .otherwise(col("_age_raw").cast("double")))
        .withColumn("gender_m", when(col("GENDER") === "M", 1.0).otherwise(0.0))
      val asm = new VectorAssembler()
        .setInputCols(("_bow" +: diagCats.map(c => s"diag_$c")).toArray
          ++ Array("age", "gender_m"))
        .setOutputCol("features")
      val out = asm.transform(aged)
        .select(col("HADM_ID").as("id"),
          col("label").cast("double").as("label"),
          col("split"), col("features"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      toksed.unpersist()
      (out, vocab)
    }
  }

  /** The reference's feature-selection ranking (py:633-638,
    * `mutual_info_classif(X_train_tf, y_train)` → sort desc): plug-in MI
    * of every matrix column against the label over the TRAIN rows,
    * ranked on ROUND-6 MI with a feature-name tiebreak so a sub-ulp
    * cross-engine drift in the term sum cannot flip an order — exactly
    * DuckDB-oracle-able (the `mimic_feature_select` row).
    *
    * Computed in the feature-NAME space straight from the source tables
    * (matrix cells ARE token/category counts, so the joint distribution
    * is identical): nonzero cells from one token/diagnosis aggregation
    * plus per-feature zero-completion for the sparse features, dense
    * joints for age/gender. The feature universe is the DECLARED one
    * (3,000 vocab words + 17 categories + age + gender) so constant
    * columns still rank (MI exactly 0), like sklearn's.
    *
    * Scale shape: one token explode → two-level hash-agg (map-side
    * combined), a broadcast vocab join, and windows over the ≤|features|
    * × |values| × 2 joint-count frame — never over the data.
    */
  /** The MI ranking's own derivation of the matrix vocabulary: the
    * top-3000 cut (count desc, word asc) over the modeling rows' note
    * tokens — the SET [[assembled]] turns into BoW slots, without forcing
    * the full 45k × 3,019 assembly + its session-lifetime cache pin (a
    * select-only session shouldn't pay the matrix build). COUPLING
    * CAUTION: this splits on a single space where the matrix build runs
    * ml.Tokenizer (lowercase, \\s+) over the left-joined fillna(" ")
    * frame — equivalent on the generated text (lowercase, single-spaced,
    * non-empty notes), and MimicSynthSpec pins SET equality with
    * [[vocabulary]] so a generator change that breaks the equivalence
    * fails the suite instead of crashing the sweep's slot lookup.
    */
  private[graft] def rankingVocabulary(s: SparkSession): DataFrame =
    MimicSynth.notes(s)
      .filter(col("CATEGORY") === "Discharge summary")
      .select(col("HADM_ID"), explode(split(col("TEXT"), " ")).as("word"))
      .join(MimicSynth.modelingRows(s).select("HADM_ID"), "HADM_ID")
      .groupBy("word").agg(count(lit(1)).as("_c"))
      .orderBy(desc("_c"), asc("word")).limit(3000).select("word")

  def miRanking(s: SparkSession): DataFrame = {
    import s.implicits._
    // not cached: the returned frame is LAZY (a cache here would be
    // released before anything runs), and modelingRows is pure md5
    // arithmetic over 59k generator rows — each of the four branch
    // re-reads costs less than a pin + eager materialization would
    val train = MimicSynth.modelingRows(s)
      .filter(col("split") === "train")
      .select(col("HADM_ID"), col("SUBJECT_ID"), col("label").as("y"))
    val tot = train.groupBy("y").agg(count(lit(1)).as("ny"))
    val vocabDf = rankingVocabulary(s)
    val bowPairs = MimicSynth.notes(s)
      .filter(col("CATEGORY") === "Discharge summary")
      .select(col("HADM_ID"), explode(split(col("TEXT"), " ")).as("word"))
      .join(broadcast(vocabDf), "word")
      .join(train.select("HADM_ID", "y"), "HADM_ID")
      .groupBy(col("word"), col("HADM_ID"), col("y"))
      .agg(count(lit(1)).as("v"))
      .select(concat(lit("bow:"), col("word")).as("feature"), col("v"), col("y"))
    val code3 = coalesce(
      when(col("ICD9_CODE").rlike("[A-Za-z]"), lit(999))
        .otherwise(substring(col("ICD9_CODE"), 1, 3).cast("int")),
      lit(999))
    val diagPairs = MimicSynth.diagnoses(s)
      .withColumn("cat", graft.SparkEntry.icd9Category(code3))
      .join(train.select("HADM_ID", "y"), "HADM_ID")
      .groupBy(col("cat"), col("HADM_ID"), col("y"))
      .agg(count(lit(1)).as("v"))
      .select(concat(lit("diag_"), col("cat")).as("feature"), col("v"), col("y"))
    // nonzero joint cells for the sparse features
    val sparseJoint = bowPairs.unionByName(diagPairs)
      .groupBy("feature", "v", "y").agg(count(lit(1)).as("nxy"))
    // zero-completion over the DECLARED sparse universe: a feature absent
    // from a label's rows still owes that label its all-zero cell
    val declared = vocabDf.select(concat(lit("bow:"), col("word")).as("feature"))
      .unionByName(diagCats.toDF("cat")
        .select(concat(lit("diag_"), col("cat")).as("feature")))
    val zeroCells = declared.crossJoin(tot)
      .join(sparseJoint.groupBy("feature", "y").agg(sum("nxy").as("nfy")),
        Seq("feature", "y"), "left")
      .select(col("feature"), lit(0L).as("v"), col("y"),
        (col("ny") - coalesce(col("nfy"), lit(0L))).as("nxy"))
    // dense features: every train row carries a value (no completion);
    // two plain hash-aggs over the 36k-row frame — an explode-of-structs
    // unpivot here trips a Janino codegen failure (interpreted fallback)
    // for zero benefit at 2 columns
    val admMin = MimicSynth.admissions(s)
      .groupBy("SUBJECT_ID").agg(min("ADMITTIME").as("_admit_min"))
    val d0 = train
      .join(admMin, Seq("SUBJECT_ID"))
      .join(MimicSynth.patients(s), Seq("SUBJECT_ID"))
      .withColumn("_age_raw",
        floor(graft.ops.CohortOps.fractionalDays(col("_admit_min"), col("DOB")) / 365.0))
      .withColumn("age",
        when(col("_age_raw") > 89 || col("_age_raw") < 0, 90L)
          .otherwise(col("_age_raw").cast("long")))
      .withColumn("gender_m", when(col("GENDER") === "M", 1L).otherwise(0L))
      .select(col("y"), col("age"), col("gender_m"))
    val denseJoint = d0
      .groupBy(col("age").as("v"), col("y")).agg(count(lit(1)).as("nxy"))
      .select(lit("age").as("feature"), col("v"), col("y"), col("nxy"))
      .unionByName(d0
        .groupBy(col("gender_m").as("v"), col("y")).agg(count(lit(1)).as("nxy"))
        .select(lit("gender_m").as("feature"), col("v"), col("y"), col("nxy")))
    val mi = graft.ml.FeatureScoring.mutualInfoFromCounts(
      sparseJoint.unionByName(zeroCells).unionByName(denseJoint))
    mi.select(col("feature"), round(col("mutual_info"), 6).as("mi"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("mi").desc, col("feature").asc)))
      .select(col("rank").cast("long").as("rank"), col("feature"), col("mi"))
  }
}
