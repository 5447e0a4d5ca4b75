package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persistence for trained tokenizers — the [[AnnIO]] philosophy: at
  * corpus scale the trained artifact outlives any session (a merge
  * table or piece model is trained once and then segments months of
  * ingest), so models round-trip through plain parquet RELATIONS on
  * any Hadoop FS, never pickled objects; any engine can read them.
  *
  *   - BPE ([[Bpe.trainMerges]]): `path/merges`
  *     (rank, left, right, pair_count) — rank order IS the model;
  *   - Unigram ([[Unigram.Model]]): `path/pieces` (piece, cost_micro)
  *     + `path/meta` (unk_cost_micro, max_piece_len).
  *
  * Loads validate shape loudly (dense ranks from 0, unique pieces,
  * one meta row) — a foreign or corrupted artifact must fail, not
  * segment wrongly.
  */
object TokenizerIO {

  def saveBpe(merges: Seq[(Int, String, String, Long)], spark: SparkSession,
      path: String): Unit = {
    import spark.implicits._
    merges.toDF("rank", "left", "right", "pair_count")
      .write.mode("overwrite").parquet(s"$path/merges")
  }

  def loadBpe(spark: SparkSession, path: String): Seq[(Int, String, String, Long)] = {
    val rows = spark.read.parquet(s"$path/merges")
      .select(col("rank").cast("int"), col("left"), col("right"),
        col("pair_count").cast("long"))
      .orderBy("rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    rows.zipWithIndex.foreach { case ((rk, _, _, _), i) =>
      require(rk == i, s"BPE merge table corrupt: rank $rk at position $i " +
        s"(ranks must be dense from 0)")
    }
    rows
  }

  /** WordPiece vocabulary: `path/vocab` (piece) + `path/meta`
    * (unk_token). Saved from the RELATION form ([[WordPiece.vocabFrame]]
    * or any externally trained vocab) so construction never collects.
    */
  def saveWordPiece(vocab: org.apache.spark.sql.DataFrame,
      unkToken: String, path: String): Unit = {
    val spark = vocab.sparkSession
    import spark.implicits._
    require(vocab.columns.contains("piece"),
      s"saveWordPiece: expected a 'piece' column, got ${vocab.columns.mkString(",")}")
    Seq(unkToken).toDF("unk_token")
      .write.mode("overwrite").parquet(s"$path/meta")
    vocab.select(col("piece").cast("string"))
      .write.mode("overwrite").parquet(s"$path/vocab")
  }

  def loadWordPiece(spark: SparkSession, path: String): (Seq[String], String) = {
    val pieces = spark.read.parquet(s"$path/vocab")
      .select(col("piece")).orderBy("piece")
      .collect().map(_.getString(0)).toSeq
    require(pieces.nonEmpty, "wordpiece vocab corrupt: no pieces")
    require(pieces.distinct.length == pieces.length,
      "wordpiece vocab corrupt: duplicate pieces")
    val meta = spark.read.parquet(s"$path/meta")
      .select(col("unk_token").cast("string")).collect()
    require(meta.length == 1,
      s"wordpiece vocab corrupt: ${meta.length} meta rows (want 1)")
    (pieces, meta(0).getString(0))
  }

  def saveUnigram(m: Unigram.Model, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    m.pieces.toDF("piece", "cost_micro")
      .write.mode("overwrite").parquet(s"$path/pieces")
    Seq((m.unkCostMicro, m.maxPieceLen)).toDF("unk_cost_micro", "max_piece_len")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadUnigram(spark: SparkSession, path: String): Unigram.Model = {
    val pieces = spark.read.parquet(s"$path/pieces")
      .select(col("piece"), col("cost_micro").cast("long"))
      .orderBy("piece")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    require(pieces.nonEmpty, "unigram model corrupt: no pieces")
    require(pieces.map(_._1).distinct.length == pieces.length,
      "unigram model corrupt: duplicate pieces")
    val meta = spark.read.parquet(s"$path/meta")
      .select(col("unk_cost_micro").cast("long"), col("max_piece_len").cast("int"))
      .collect()
    require(meta.length == 1,
      s"unigram model corrupt: ${meta.length} meta rows (want 1)")
    Unigram.Model(pieces, meta(0).getLong(0), meta(0).getInt(1))
  }
}
