package graft.kg

/** Deterministic synthetic-transcript universe (FIXTURES.md §4): every value
  * is a pure function of (conversation index, turn index), so the expected
  * knowledge-graph triples are computable exactly — the P/R oracle for the
  * construction pipeline. No external data.
  */
object Universe {
  val ns = "http://graft.example.org/"
  val relWorksAt = ns + "worksAt"
  val relCollab = ns + "collaboratesWith"
  val relContrib = ns + "contributesTo"
  val rdfType = graft.rdf.Rdf.rdfType
  val clsPerson = ns + "Person"
  val clsOrg = ns + "Organization"
  val clsProject = ns + "Project"

  private val firstNames = Vector("Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald", "Leslie", "Tony")
  private val lastRoots = Vector("Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov", "Knuth", "Lamport", "Hoare")
  private val orgRoots = Vector("Initech", "Globex", "Umbrella", "Hooli", "Vandelay", "Aperture", "Tyrell", "Acme")
  private val projRoots = Vector("Apollo", "Zephyr", "Borealis", "Quasar", "Nimbus", "Vortex", "Pulsar", "Comet")

  /** splitmix64 — stable deterministic mixing. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  private def pick(h: Long, mod: Int): Int = (java.lang.Long.remainderUnsigned(h, mod.toLong)).toInt

  /** entity kinds cycle Person/Organization/Project by index mod 3 */
  def kind(k: Int): String = (k % 3) match {
    case 0 => clsPerson
    case 1 => clsOrg
    case _ => clsProject
  }

  def canonicalSurface(k: Int): String = (k % 3) match {
    case 0 => s"${firstNames(k % 8)}$k ${lastRoots(k % 8)}$k"
    case 1 => s"${orgRoots(k % 8)}$k Corp"
    case _ => s"Project ${projRoots(k % 8)}$k"
  }

  /** Alias variants — what actually appears in transcript text. Variant 0 is
    * always the canonical (longest) surface. */
  def aliases(k: Int): Vector[String] = (k % 3) match {
    case 0 => Vector(
      s"${firstNames(k % 8)}$k ${lastRoots(k % 8)}$k",
      s"${firstNames(k % 8).charAt(0)}. ${lastRoots(k % 8)}$k",
      s"${lastRoots(k % 8)}$k")
    case 1 => Vector(s"${orgRoots(k % 8)}$k Corp", s"${orgRoots(k % 8)}$k")
    case _ => Vector(s"Project ${projRoots(k % 8)}$k", s"${projRoots(k % 8)}$k")
  }

  /** entity IRI from its canonical surface */
  def iri(k: Int): String = ns + canonicalSurface(k).replace(" ", "_")

  final case class Turn(role: String, text: String, tool: String,
                        facts: Seq[(String, String, String)])

  private val roles = Vector("user", "assistant", "tool")
  private val tools = Vector("search", "browse", "exec")

  /** Deterministic content of turn (c, t) over a universe of `e` entities
    * (e must be a positive multiple of 3). */
  def turn(c: Long, t: Int, e: Int): Turn = {
    val h = mix64(c * 1000003L + t)
    val nPer = e / 3
    val role = roles(t % 3)
    val tool = if (role == "tool") tools(pick(mix64(h + 7), 3)) else ""

    def person(seed: Long): Int = 3 * pick(seed, nPer)
    def org(seed: Long): Int = 3 * pick(seed, nPer) + 1
    def project(seed: Long): Int = 3 * pick(seed, nPer) + 2
    def alias(k: Int, seed: Long): String = { val a = aliases(k); a(pick(seed, a.size)) }

    // lowercase context padding around the fact sentence — realistic turn
    // lengths (hundreds of chars), never capitalized so it yields no mentions
    def padding(seed: Long, clauses: Int): String = {
      val parts = Vector(
        "let me look into the details of that request",
        "based on the earlier context in this conversation",
        "running the analysis tool against the latest snapshot",
        "the results from the previous step were inconclusive",
        "summarizing what we have gathered so far for the report",
        "please double check the assumptions before we proceed",
        "the relevant documentation section was updated recently",
        "considering the constraints mentioned in the ticket")
      (0 until clauses).map(i => parts(pick(mix64(seed + i), parts.size))).mkString(", ") + " ."
    }
    val pre = padding(mix64(h + 11), 1 + pick(mix64(h + 13), 3))
    val post = padding(mix64(h + 17), 1 + pick(mix64(h + 19), 3))

    val form = pick(h, 7)
    form match {
      case 0 =>
        val s = person(mix64(h + 1)); val o = org(mix64(h + 2))
        Turn(role, s"$pre ${alias(s, mix64(h + 3))} works at ${alias(o, mix64(h + 4))} . $post", tool,
          Seq((iri(s), relWorksAt, iri(o))))
      case 1 =>
        val s = person(mix64(h + 1))
        var o = person(mix64(h + 2))
        if (o == s) o = (o + 3) % e
        Turn(role, s"$pre ${alias(s, mix64(h + 3))} collaborates with ${alias(o, mix64(h + 4))} . $post", tool,
          Seq((iri(s), relCollab, iri(o))))
      case 2 =>
        val s = person(mix64(h + 1)); val o = project(mix64(h + 2))
        Turn(role, s"$pre ${alias(s, mix64(h + 3))} contributes to ${alias(o, mix64(h + 4))} . $post", tool,
          Seq((iri(s), relContrib, iri(o))))
      case 3 =>
        val k = pick(mix64(h + 1), e)
        val kindWord = (k % 3) match {
          case 0 => "person"; case 1 => "organization"; case _ => "project"
        }
        Turn(role, s"$pre ${alias(k, mix64(h + 3))} is a $kindWord . $post", tool,
          Seq((iri(k), rdfType, kind(k))))
      case 4 =>
        // TWO fact sentences in one turn — real transcripts pack several
        // facts per turn; the extraction oracle must catch first-match-only
        // extraction bugs (a single-fact universe cannot)
        val s1 = person(mix64(h + 1)); val o1 = org(mix64(h + 2))
        val s2 = person(mix64(h + 21)); val o2 = project(mix64(h + 22))
        Turn(role,
          s"$pre ${alias(s1, mix64(h + 3))} works at ${alias(o1, mix64(h + 4))} . " +
            s"${alias(s2, mix64(h + 23))} contributes to ${alias(o2, mix64(h + 24))} . $post", tool,
          Seq((iri(s1), relWorksAt, iri(o1)), (iri(s2), relContrib, iri(o2))))
      case _ =>
        // filler — all lowercase, so no mentions are extracted
        val fillers = Vector(
          "please summarize the last tool output for me .",
          "running the requested command now and waiting for results .",
          "the quick brown fox jumps over the lazy dog .",
          "let me check the previous conversation turns for context .")
        Turn(role, s"$pre ${fillers(pick(mix64(h + 5), fillers.size))} $post", tool, Nil)
    }
  }

  /** Skewed turns-per-conversation: a heavy tail plus forced mega
    * conversations every `megaEvery` conversations (exercises the
    * salting/skew paths — FIXTURES.md §4). */
  def turnsPerConv(c: Long, megaEvery: Int = 997, megaTurns: Int = 2000): Int =
    if (megaEvery > 0 && c % megaEvery == 0 && c > 0) megaTurns
    else 3 + pick(mix64(c * 2654435761L), 61)
}
