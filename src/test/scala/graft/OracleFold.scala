package graft

import scala.collection.mutable

/** Independent in-memory reference: a plain HashMap fold over change
  * events in LSN order, applying the same validation rules as the engine.
  * This is the "reference snapshot" side of the replay-equivalence
  * acceptance test (SURVEY.md §5.2-2; reference's own verification idiom:
  * compareSGIDpts.py:34-62). Deliberately shares NO code with the engine.
  */
object OracleFold {
  case class Ev(
      lsn: Long, op: String, docId: String,
      tokens: scala.collection.Seq[Int], nTok: Option[Long], source: String)

  case class Doc(tokens: scala.collection.Seq[Int], nTok: Long, source: String, lsn: Long)

  def valid(e: Ev): Boolean =
    e.docId != null &&
      Set("I", "U", "D").contains(e.op) &&
      (e.op == "D" || (e.tokens != null && e.nTok.contains(e.tokens.length.toLong)))

  /** Final state after replaying all events (any delivery order). */
  def fold(events: Seq[Ev]): Map[String, Doc] = {
    val state = mutable.HashMap.empty[String, Doc]
    events.filter(valid).sortBy(_.lsn).foreach { e =>
      e.op match {
        case "D" => state.remove(e.docId)
        case _ =>
          state(e.docId) =
            Doc(e.tokens, e.nTok.get, if (e.source == null) "unknown" else e.source, e.lsn)
      }
    }
    state.toMap
  }

  def invalid(events: Seq[Ev]): Seq[Ev] = events.filterNot(valid)
}
