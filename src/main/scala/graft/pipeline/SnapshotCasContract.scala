package graft.pipeline

/** Contract-test kit for [[SnapshotCas]] providers — runnable by any
  * third-party implementation before it is trusted with commits,
  * because the provider's contract IS the commit safety: a provider
  * that can return true twice for one target silently loses commits.
  *
  * Ship-shape usage (what the in-tree specs do):
  *
  * {{{
  * val bad = SnapshotCasContract.violations(myProvider, fs, scratchDir)
  * assert(bad.isEmpty, bad.mkString("; "))
  * }}}
  *
  * Checks, in order: create-returns-true with the exact bytes visible;
  * existing-returns-false with the FIRST writer's bytes intact;
  * exactly-one-winner under real thread races (the table-stakes
  * property — run per round on a fresh target with distinct payloads,
  * the winner's payload must be what the store holds); and the
  * OPTIONAL touch face (an advancing freshness signal on an existing
  * object, `FileNotFoundException` — never success — on a missing
  * one). IO-error behavior (throw, never report a conflict) is
  * store-specific to induce and is asserted by each provider's own
  * spec against its own broken-store fixture. */
object SnapshotCasContract {

  def violations(provider: SnapshotCas,
                 fs: org.apache.hadoop.fs.FileSystem,
                 scratch: org.apache.hadoop.fs.Path,
                 racers: Int = 8, raceRounds: Int = 3): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    fs.mkdirs(scratch)
    def read(p: org.apache.hadoop.fs.Path): Array[Byte] = {
      val in = fs.open(p)
      try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    }

    // 1. create: true, and the target holds exactly the bytes
    val t1 = new org.apache.hadoop.fs.Path(scratch, "contract-create")
    val b1 = "first-writer".getBytes("UTF-8")
    if (!provider.putIfAbsent(fs, t1, b1))
      out += "create: putIfAbsent on a fresh target returned false"
    else if (!java.util.Arrays.equals(read(t1), b1))
      out += "create: target does not hold the put bytes"

    // 2. conflict: false, and the FIRST writer's bytes survive
    if (provider.putIfAbsent(fs, t1, "second-writer".getBytes("UTF-8")))
      out += "conflict: putIfAbsent on an existing target returned true " +
        "— two committers of one snapshot id could both win"
    else if (!java.util.Arrays.equals(read(t1), b1))
      out += "conflict: a losing put MUTATED the existing target"

    // 3. exactly one winner under concurrency, per round
    for (round <- 1 to raceRounds) {
      val t = new org.apache.hadoop.fs.Path(scratch, s"contract-race-$round")
      val results = new java.util.concurrent.ConcurrentHashMap[Int, Boolean]()
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until racers).map { i =>
        new Thread(() => {
          start.await()
          val won = try provider.putIfAbsent(fs, t,
            s"racer-$i".getBytes("UTF-8"))
          catch { case _: Throwable => false }
          results.put(i, won)
        })
      }
      threads.foreach(_.start()); start.countDown()
      threads.foreach(_.join(60000))
      val winners = (0 until racers).filter(results.getOrDefault(_, false))
      if (winners.size != 1)
        out += s"race round $round: ${winners.size} of $racers racers " +
          "won the conditional create (must be exactly 1)"
      else if (!java.util.Arrays.equals(read(t),
        s"racer-${winners.head}".getBytes("UTF-8")))
        out += s"race round $round: the target holds bytes that are NOT " +
          "the winner's"
    }

    // 4. optional touch face
    val before = fs.getFileStatus(t1).getModificationTime
    Thread.sleep(20)
    val touched = try provider.touch(fs, t1) catch {
      case t: Throwable =>
        out += s"touch: threw on an EXISTING object: $t"; false
    }
    if (touched && fs.getFileStatus(t1).getModificationTime < before)
      out += "touch: reported true but the freshness signal went backwards"
    // a touch must be CONTENT-PRESERVING no matter WHAT it reported: a
    // store that misroutes the idiom into a plain overwrite while the
    // provider reports false (unsupported) is the worst case — the
    // object is destroyed and nothing claimed success
    if (!java.util.Arrays.equals(read(t1), b1))
      out += "touch: the attempt MUTATED the object's bytes (reported " +
        s"$touched) — a re-arm must be metadata-only even when the " +
        "store does not support it"
    val missing = new org.apache.hadoop.fs.Path(scratch, "contract-missing")
    try {
      if (provider.touch(fs, missing))
        out += "touch: returned true for a MISSING object — GC would " +
          "trust a re-arm that pinned nothing"
    } catch {
      case _: java.io.FileNotFoundException => () // the contract
      case t: Throwable =>
        out += s"touch: missing object must raise FileNotFoundException " +
          s"or return false, got $t"
    }
    // ...and the missing-object attempt must not have CREATED anything
    if (fs.exists(missing))
      out += "touch: the missing-object attempt CREATED the target — a " +
        "re-arm must never materialize objects"
    out.toSeq
  }
}
