package graft.functions

/** Shared kernel of the hash-ordered bounded sketches ([[KmvSketch]],
  * [[BottomKSample]], streaming.StreamWau): one md5 definition and one
  * keep-k-smallest-distinct-sorted insert, so the aggregators and the
  * streaming state cannot drift apart from each other or from the
  * Sketches SQL twins that mirror the same hash. */
private[graft] object BottomK {

  def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Insert keeping `b` sorted ascending by `key`, distinct, ≤ `k`. */
  def insert[A](b: List[A], a: A, k: Int)(key: A => String): List[A] = {
    val ka = key(a)
    if (b.exists(x => key(x) == ka)) b
    else if (b.size < k) (a :: b).sortBy(key)
    else if (ka < key(b.last)) (a :: b.init).sortBy(key)
    else b
  }
}
