package graft.operators

/** Shared pure-Scala reference for the leftmost-greedy BPE merge —
  * ONE definition, used by both BpeTrainerSpec's adversarial cases and
  * RandomizedTrainOpsSpec's full-trainer differential: two drifting
  * copies would pin contradictory "reference" semantics. */
object BpeTestRef {
  def greedy(s: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toSeq
  }
}
