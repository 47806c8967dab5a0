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
}
