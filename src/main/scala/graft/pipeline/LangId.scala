package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style language identification (Joulin et al. 2016, "Bag of
  * Tricks for Efficient Text Classification" — the architecture behind
  * the langid gate of every multilingual corpus pipeline, CCNet §3):
  * a LINEAR classifier over HASHED character n-gram features. This
  * restatement keeps the three load-bearing ideas — char n-grams (robust
  * to tokenization and diacritics), feature hashing into a fixed bucket
  * table (memory-bounded vocabulary), linear per-class scores (one
  * dot product per language) — and drops the embedding layer, which at
  * corpus-scale serving is a lookup+sum exactly like the hashed linear
  * form.
  *
  * Everything is INTEGER end-to-end so the DuckDB oracle replays the
  * scores bit-for-bit regardless of evaluation order:
  *
  *  - features: char 3-grams of the input, bucketed by the engine's
  *    md5-based [[TextOps.hash60]] mod `B` (the oracle's
  *    `('0x'||substr(md5(g),1,15))::BIGINT` mirror is already proven by
  *    the dedup operators);
  *  - weights: trained by a deterministic multiclass perceptron
  *    (integer updates, fixed epoch/sentence order — no floats, no RNG)
  *    over an EMBEDDED public-domain-style fixture corpus, at object
  *    init on the driver. Training is corpus-independent, so the
  *    weights are constants shared verbatim by the Spark plan (array
  *    literals in a codegen HOF) and the oracle SQL (list literals) —
  *    the PQ-codebook driver-local-training pattern with a fully
  *    replayable serve path;
  *  - scores: `Σ_g w[lang][bucket(g)]` per language; prediction is the
  *    max score with ties broken in fixed `Langs` order.
  *
  * Serving is ONE projection — no shuffle, no UDF, no join; per-doc
  * cost is one md5 per 3-gram. At 100 TB this is embarrassingly
  * parallel map work, the same shape as the reference pipelines' C++
  * fastText scoring pass.
  */
object LangId {

  /** Hash buckets. 2^10 keeps the weight tables small enough to inline
    * in both the Spark plan and the oracle SQL while holding the
    * fixture's ~3k distinct grams at ~3 per bucket — collisions are
    * part of the hashing-trick contract, not an error.
    */
  val B = 1024

  /** Class order = tie-break order, everywhere. */
  val Langs: Seq[String] = Seq("en", "de", "es", "fr", "zh")

  /** Per-language function words for header PLANTING in demo queries
    * (en/de/es/fr reuse [[TextOps.LangMarkers]]; zh is romanized pinyin
    * function words so every engine-side string stays ASCII).
    */
  val Lexicons: Map[String, Seq[String]] =
    TextOps.LangMarkers.toMap + ("zh" -> Seq(
      "de", "le", "shi", "bu", "wo", "ni", "men", "zhe", "na", "you"))

  /** Embedded training fixture: natural-ish sentences per language
    * (function-word-dense, as real training text is) plus the lexicon
    * itself as one document per language (the wordlist-prior trick).
    * ASCII only; training happens JVM-side only, so this is a
    * determinism convenience, not a correctness requirement.
    */
  val TrainFixture: Seq[(String, String)] = Seq(
    "en" -> "the quick brown fox jumps over the lazy dog",
    "en" -> "it is a truth universally acknowledged that a single man may want for nothing",
    "en" -> "we hold these truths to be self evident that all men are created equal",
    "en" -> "to be or not to be that is the question for it is the mind that makes it so",
    "en" -> "in the beginning there was the word and the word was with us on the water",
    "en" -> "she sells sea shells on the sea shore and the shells that she sells are sea shells",
    "de" -> "der schnelle braune fuchs springt ueber den faulen hund und ist nicht muede",
    "de" -> "es ist eine allgemein anerkannte wahrheit dass ein mann mit vermoegen eine frau sucht",
    "de" -> "am anfang war das wort und das wort war bei uns und wir waren mit dem wasser",
    "de" -> "sein oder nicht sein das ist hier die frage die der geist sich stellt",
    "de" -> "die wuerde des menschen ist unantastbar und das recht steht ueber der macht",
    "de" -> "ich weiss nicht was soll es bedeuten dass ich so traurig bin",
    "es" -> "el rapido zorro marron salta sobre el perro perezoso y no esta cansado",
    "es" -> "es una verdad universalmente reconocida que un hombre soltero necesita una esposa",
    "es" -> "en un lugar de la mancha de cuyo nombre no quiero acordarme vivia un hidalgo",
    "es" -> "ser o no ser esa es la cuestion que la mente se hace en el agua",
    "es" -> "todos los seres humanos nacen libres e iguales en dignidad y en derechos",
    "es" -> "la vida no es la que uno vivio sino la que uno recuerda y como la recuerda",
    "fr" -> "le renard brun et rapide saute par dessus le chien paresseux dans le jardin",
    "fr" -> "c est une verite universellement reconnue qu un homme fortune cherche une femme",
    "fr" -> "longtemps je me suis couche de bonne heure et je pensais dans la nuit",
    "fr" -> "etre ou ne pas etre voila la question que l esprit se pose pour l eau",
    "fr" -> "tous les etres humains naissent libres et egaux en dignite et en droits",
    "fr" -> "il etait une fois dans une petite ville un homme qui ne dormait pas",
    "zh" -> "wo men de peng you shi bu shi zai zhe li ni men you mei you kan dao",
    "zh" -> "zhe shi yi ge hen hao de di fang wo men dou xi huan zai zhe li",
    "zh" -> "ni hao ma wo hen hao xie xie ni ne ni ye hao ma",
    "zh" -> "ta men shuo de hua wo bu dong ni neng bu neng zai shuo yi bian",
    "zh" -> "na ge ren shi shei wo bu zhi dao ta shi na li de ren",
    "zh" -> "jin tian tian qi hen hao wo men qu wai mian zou yi zou ba") ++
    Lexicons.toSeq.sortBy(_._1).map { case (l, ws) => l -> ws.mkString(" ") }

  /** Oracle-path weights (md5 buckets) — see [[TextClassifier]] for
    * the shared training/serving core.
    */
  val Weights: IndexedSeq[IndexedSeq[Long]] =
    TextClassifier.train(TrainFixture, Langs, B,
      TextClassifier.bucketsMd5(_, B))

  /** Fast-path weights (rolling ring buckets — [[classifyFast]]). */
  lazy val WeightsFast: IndexedSeq[IndexedSeq[Long]] =
    TextClassifier.train(TrainFixture, Langs, B,
      TextClassifier.bucketsRing(_, B))

  /** (doc_id, score_<lang>..., lang_pred, margin) — one codegen
    * projection; margin = score(pred) − best other (the fastText
    * confidence signal; threshold to emit 'und').
    */
  def classify(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    TextClassifier.classifyWith(docs, idCol,
      TextClassifier.md5Buckets(textCol, B), Langs, Weights, "lang_pred")

  /** Same architecture, ~10× cheaper serving: buckets come from the
    * one-pass codegen'd rolling ring hash
    * ([[graft.functions.CharWindowHashes]] — no md5 per gram) with
    * weights retrained under that hash. NOT oracle-replayable (the
    * 64-bit ring has no SQL mirror) — the spec pins prediction
    * agreement with [[classify]] instead; prefer this path at corpus
    * scale, the md5 path where cross-engine replay matters.
    */
  def classifyFast(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    TextClassifier.classifyWith(docs, idCol,
      TextClassifier.ringBuckets(textCol, B), Langs, WeightsFast, "lang_pred")

  /** The same scoring as [[classify]] as a complete DuckDB query,
    * generated from the same weight constants. `srcCte` must be a
    * query producing (doc_id, __t) with __t already lowercased.
    */
  def scoreSqlFrom(srcCte: String): String =
    TextClassifier.scoreSqlFrom(srcCte, Langs, B, Weights, "lang_pred")

  /** Fit language-id weights on YOUR labeled relation (md5 buckets, so
    * the result serves on the oracle-replayable path) — the embedded
    * fixture is a demo stand-in; real corpora carry their own label
    * column. `classes` defaults to [[Langs]] but accepts any label set
    * (its order = tie-break order). Serve via [[classifyWith]].
    */
  def trainFromDF(labeled: DataFrame, idCol: String, labelCol: String,
      textCol: String, classes: Seq[String] = Langs,
      maxSamples: Int = 100000): IndexedSeq[IndexedSeq[Long]] =
    TextClassifier.trainFromDF(labeled, idCol, labelCol, textCol, classes,
      B, TextClassifier.bucketsMd5(_, B), maxSamples)

  /** Serve with corpus-trained weights (from [[trainFromDF]]). */
  def classifyWith(docs: DataFrame, idCol: String, textCol: String,
      weights: IndexedSeq[IndexedSeq[Long]],
      classes: Seq[String] = Langs): DataFrame =
    TextClassifier.classifyWith(docs, idCol,
      TextClassifier.md5Buckets(textCol, B), classes, weights, "lang_pred")
}
