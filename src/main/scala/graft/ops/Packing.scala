package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data preparation — the
  * "concatenate the tokenized corpus in a deterministic order, then cut
  * fixed-length training sequences" step (GPT-style packing; the
  * complement of q55's pad-minimizing batching: packing eliminates
  * padding entirely by letting documents cross sequence boundaries).
  *
  * Semantics, all exact integer arithmetic (hence the full hash oracle):
  * documents ordered by `idCol`; `prefix` = EXCLUSIVE running sum of
  * token counts; a doc's first token lands at sequence
  * `start_seq = prefix div L`, offset `start_off = prefix mod L`, and
  * the doc spans `((prefix + toks - 1) div L) - start_seq + 1`
  * sequences (0 for empty docs).
  *
  * Distributed shape — the point of this operator: a global
  * `Window.orderBy` with NO partitionBy collapses the corpus into one
  * task (the classic prefix-sum scale trap). The running sum here is a
  * TWO-PASS distributed prefix sum instead: (1) an exclusive cumsum
  * WITHIN bounded blocks (`Window.partitionBy(block)`, block = a
  * deterministic id range), (2) per-block totals — ONE ROW PER BLOCK —
  * get their own exclusive cumsum and join back as block offsets. The
  * pass-2 window still runs in a single task, but over corpus/blockSize
  * rows, a bounded frame (10^12 docs at 10^6-doc blocks → 10^6 rows;
  * recurse the same two-pass step if block count itself outgrows a
  * task). The block-offset join is keyed on the block id and the
  * offsets frame is broadcast when small — corpus rows never
  * re-shuffle for the prefix. */
object Packing {

  /** `(doc_id, n_tokens, start_seq, start_off, seqs_spanned)` for each
    * row of `docs`, packing at `seqLen` tokens per training sequence. */
  def packSequences(docs: DataFrame, seqLen: Int, blockSize: Long = 64L,
      idCol: String = "doc_id", tokCol: String = "ws_tokens"): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1: $seqLen")
    require(blockSize >= 1, s"blockSize must be >= 1: $blockSize")
    val d = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(tokCol).cast("long").as("toks"))
      .withColumn("block", expr(s"doc_id div ${blockSize}L"))
    val inBlock = d.withColumn("in_block_prefix",
      coalesce(sum("toks").over(
        Window.partitionBy("block").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val blockOffsets = d.groupBy("block").agg(sum("toks").as("btot"))
      .withColumn("block_offset",
        coalesce(sum("btot").over(
          Window.orderBy("block")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("block", "block_offset")
    inBlock.join(broadcast(blockOffsets), Seq("block"))
      .withColumn("prefix", col("block_offset") + col("in_block_prefix"))
      .select(
        col("doc_id"),
        col("toks").as("n_tokens"),
        expr(s"prefix div ${seqLen}L").as("start_seq"),
        (col("prefix") % seqLen).as("start_off"),
        when(col("toks") === 0, lit(0L)).otherwise(
          expr(s"(prefix + toks - 1) div ${seqLen}L") -
            expr(s"prefix div ${seqLen}L") + lit(1L)).as("seqs_spanned"))
  }
}
