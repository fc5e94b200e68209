package graft

/** Diagnostic: Exchange SinglePartition count per declared query (from
 * the shared SurfaceWalk), to adjudicate which global serializations
 * are bounded-by-construction before pinning an allowlist.
 * Run: sbt 'Test/runMain graft.SinglePartitionCensus'. */
object SinglePartitionCensus {
  def main(args: Array[String]): Unit = {
    SurfaceWalk.facts.toSeq.sortBy(_._1).foreach { case (name, f) =>
      if (f.singlePartitionExchanges > 0 || f.failure.nonEmpty ||
          f.globalWindowScans.nonEmpty)
        println(s"[sp] $name ${f.singlePartitionExchanges}" +
          (if (f.globalWindowScans.nonEmpty)
            s" globalWindow=${f.globalWindowScans.mkString(",")}" else "") +
          f.failure.map(e => s" FAILED: $e").getOrElse(""))
    }
    println("[sp] done")
  }
}
