package graft

/** The portable 60-bit hash REIMPLEMENTED from its spec (md5 via
  * MessageDigest, 15-hex-char prefix as a long) — deliberately independent
  * of `graft.functions.Portable`'s Column code, so specs that pin engine
  * arithmetic against it (TextOpsSpec's shingle hashes, PipelineOpsSpec's
  * Bloom model) fail the moment either side drifts from the spec. Test
  * scope only; must never be imported by main code, or the independence
  * that gives those pins their meaning is gone.
  */
object IndependentHash {
  def md5hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }
}
