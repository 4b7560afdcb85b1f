package graft.util

/** The ONE bomb-capped zip walk for the OOXML/EPUB document family
  * (DOCX/PPTX/EPUB all inflate untrusted archives): a crafted local
  * file header can declare any size, so ACTUAL inflation is metered
  * against a cumulative cap across kept entries; entry count is
  * bounded separately (a zip of a million empty entries is a CPU
  * primitive). Entries the predicate rejects are skipped, not
  * inflated into memory. Centralized so cap logic is fixed in one
  * place instead of three drifting copies. */
object ZipParts {

  /** (name, inflated bytes) for every non-directory entry `keep`
    * accepts, in zip order. `stopAfterFirst` short-circuits the walk
    * for single-part lookups (word/document.xml) without paying the
    * tail of the archive. `onEntry` observes every entry NAME walked
    * (kept or not) — package-marker checks ride the same pass. */
  def collect(zip: Array[Byte], keep: String => Boolean,
              maxTotalBytes: Long, maxEntries: Int = 100000,
              stopAfterFirst: Boolean = false,
              onEntry: String => Unit = _ => ())
      : Seq[(String, Array[Byte])] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(zip))
    val found = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
    var count = 0
    var total = 0L
    try {
      var e = zin.getNextEntry
      while (e != null) {
        count += 1
        require(count <= maxEntries,
          s"archive entry count exceeds $maxEntries")
        onEntry(e.getName)
        if (!e.isDirectory && keep(e.getName)) {
          val out = new java.io.ByteArrayOutputStream(8192)
          val buf = new Array[Byte](65536)
          var n = zin.read(buf)
          while (n >= 0) {
            total += n
            require(total <= maxTotalBytes,
              s"archive inflates past $maxTotalBytes bytes " +
                "(decompression bomb?)")
            out.write(buf, 0, n)
            n = zin.read(buf)
          }
          found += e.getName -> out.toByteArray
          if (stopAfterFirst) return found.toSeq
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    found.toSeq
  }
}
