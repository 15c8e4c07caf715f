package graft

/** Deterministic word-soup text for specs that need gate-passing prose
  * with controllable content — extracted from CorpusIngestSpec (r15) so
  * RetentionSpec's excisions case leaks the SAME fixture arithmetic the
  * ingest specs cut, instead of a drifting copy. */
object TextFixtures {
  def soupWords(seed: Long, nWords: Int): String = {
    var x = seed * 0x9e3779b97f4a7c15L + 0x632be59bd9b4e019L
    (0 until nWords).map { _ =>
      (0 until 5).map { _ =>
        x ^= x >>> 27; x *= 0x3c79ac492ba7b653L; x ^= x >>> 33
        ('a' + ((x & 0x7fffffffL) % 26)).toChar
      }.mkString
    }.mkString(" ")
  }
}
