package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming next-fit sequence packing — the delivery stage
  * ([[graft.operators.Layout.packSequences]]) run as documents
  * ARRIVE instead of over a finished corpus: each shard's packer is
  * a stateful group whose entire state is the OPEN pack triple
  * (pack_seq, fill, pos).
  *
  * Why streaming packing is Append-safe at all: next-fit never
  * revisits a pack — a document's assignment is FINAL the moment it
  * is made (the property best-fit lacks, and one more reason the
  * batch operator chose next-fit), so every assignment row emits
  * exactly once, no closed/open distinction, no sentinel flush
  * needed. State is one triple per ACTIVE shard — shard-count
  * bounded, never corpus-bounded.
  *
  * Contract (the sessionize/e15 family's): documents must arrive in
  * packing order within each shard (ascending id across epoch-aligned
  * micro-batches — within one micro-batch any arrival order is fine,
  * the group sorts by id) and exactly once; under that contract the
  * streamed assignments are row-identical to the batch
  * [[graft.operators.Layout.packSequences]] of the union
  * (spec-pinned), and [[graft.operators.Layout
  * .packSequencesIncremental]]'s append-only numbering is exactly
  * what this state reaches after a restart from the base run's
  * per-shard max.
  */
object PackStream extends Serializable {

  private[streaming] case class OpenPack(pack: Long, fill: Long,
      pos: Long)

  case class PackAssign(shard: Long, id: Long, len: Long,
      pack_seq: Long, pos_in_pack: Long, fill_after: Long)

  private[streaming] case class OpenPayload(pack: Long, fill: Long,
      nDocs: Long, payload: String)

  case class PackPayload(shard: Long, pack_seq: Long, n_docs: Long,
      n_tokens: Long, payload: String)

  def packStream(docs: DataFrame, idCol: String, lenCol: String,
      shardCol: String, budget: Long): Dataset[PackAssign] = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._

    def update(shard: Long, rows: Iterator[(Long, Long, Long)],
        state: GroupState[OpenPack]): Iterator[PackAssign] = {
      var st = state.getOption.getOrElse(OpenPack(1L, 0L, 0L))
      val out = rows.toSeq.sortBy(_._2).map { case (_, id, n) =>
        require(n >= 0, s"negative length $n for id $id")
        // occupancy (pos), not fill, guards the new-pack rule — the
        // batch fold's contract verbatim
        if (st.pos > 0 && st.fill + n > budget)
          st = OpenPack(st.pack + 1L, 0L, 0L)
        st = OpenPack(st.pack, st.fill + n, st.pos + 1L)
        PackAssign(shard, id, n, st.pack, st.pos, st.fill)
      }
      state.update(st)
      out.iterator
    }

    docs.select(col(shardCol).cast("long").as("shard"),
        col(idCol).cast("long").as("id"),
        col(lenCol).cast("long").as("len"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming payload delivery — [[graft.operators.Layout
    * .packPayloads]]'s l6 twin over an ingest stream: each shard's
    * state is the OPEN pack's buffered payload (budget-bounded by
    * construction, plus at most one oversized doc), and a pack's
    * concatenated payload emits the moment the pack CLOSES (its
    * successor overflows it) — final and Append-safe, because
    * next-fit never reopens a pack. The trailing open pack of each
    * shard rides in state awaiting its closer; flush it by ending the
    * stream's life with a sentinel epoch or reading the checkpoint
    * state — the sessionize-family trade, and why the batch operator
    * (which CAN see the corpus end) is the delivery path for finite
    * corpora while this gate ships packs continuously.
    *
    * Under the [[packStream]] arrival contract, the emitted packs are
    * row-identical to the batch [[graft.operators.Layout
    * .packPayloads]] of the union MINUS each shard's trailing open
    * pack (spec-pinned). */
  def packPayloadStream(docs: DataFrame, idCol: String,
      lenCol: String, textCol: String, shardCol: String,
      budget: Long): Dataset[PackPayload] = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._

    def update(shard: Long, rows: Iterator[(Long, Long, Long, String)],
        state: GroupState[OpenPayload]): Iterator[PackPayload] = {
      var st = state.getOption.getOrElse(OpenPayload(1L, 0L, 0L, ""))
      val out = scala.collection.mutable.ArrayBuffer[PackPayload]()
      rows.toSeq.sortBy(_._2).foreach { case (_, id, n, text) =>
        require(n >= 0, s"negative length $n for id $id")
        if (st.nDocs > 0 && st.fill + n > budget) {
          out += PackPayload(shard, st.pack, st.nDocs, st.fill,
            st.payload)
          st = OpenPayload(st.pack + 1L, 0L, 0L, "")
        }
        st = OpenPayload(st.pack, st.fill + n, st.nDocs + 1L,
          if (st.nDocs > 0) st.payload + "\n" + text else text)
      }
      state.update(st)
      out.iterator
    }

    docs.select(col(shardCol).cast("long").as("shard"),
        col(idCol).cast("long").as("id"),
        col(lenCol).cast("long").as("len"),
        col(textCol).cast("string").as("text"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
