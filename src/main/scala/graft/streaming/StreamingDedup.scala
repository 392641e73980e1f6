package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class DocEvent(fingerprint: Long, doc_id: Long, text: String)

/** Stateful streaming dedup: first-seen wins per content fingerprint,
  * implemented with flatMapGroupsWithState — the custom-state operator
  * for semantics windowed aggregations can't express.
  *
  * State is one boolean per fingerprint key, partitioned by key across
  * the cluster; at 100 TB of stream history the state store holds one
  * entry per distinct document, which is why the key is the 64-bit
  * fingerprint rather than the text. Production would add a state TTL
  * (`GroupStateTimeout.ProcessingTimeTimeout`) to bound the store; the
  * fixture demo keeps state unbounded for determinism.
  */
object StreamingDedup {

  def firstSeenOnly(events: Dataset[DocEvent]): Dataset[DocEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState[Boolean, DocEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[DocEvent], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // several duplicates may arrive in one batch: emit min doc_id
            Iterator.single(rows.minBy(_.doc_id))
          }
      }
  }
}
