package graft.jsonld

/** Conformance cases excluded from the green gate. Populated only with
  * cases the reference implementation itself fails (so they are outside
  * the P/R metric's target set) — see CONFORMANCE.md for the audit trail. */
object KnownFailures {
  val ids: Set[String] = Set(
  )
}
