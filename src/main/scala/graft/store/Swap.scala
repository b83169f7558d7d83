package graft.store

/**
 * Swap-on-success directory commit — the shared rename pair under every
 * store maintenance rewrite here (census compaction, IVF re-cluster;
 * `TradeStore.compact` documents the contract): maintenance writes to a
 * NEW path while the live path stays readable, then the swap retires
 * the live dir and moves the new one in. The second rename is the
 * commit point; readers always see either the whole old state or the
 * whole new state, never a mix. On a real object store these are
 * manifest/metadata pointer moves (table-format commit); locally they
 * are directory renames.
 */
object Swap {

  private def retiredPath(path: String) =
    java.nio.file.Paths.get(path.stripSuffix("/") + ".retired")

  /** live → retired, next → live, delete retired. Crash taxonomy:
    * before the first rename — live untouched, `next` re-creatable
    * (every caller's rewrite is a pure function of the source);
    * between the renames — live name missing but the retired dir holds
    * the complete old state, [[recover]] restores it; after the second
    * rename — committed, the retired copy is garbage. */
  def commit(path: String, next: String): Unit = {
    import java.nio.file.{Files, Paths}
    val live = Paths.get(path)
    val retired = retiredPath(path)
    // a leftover retired dir (crash after the commit point but before
    // its delete completed) is garbage by definition once live exists —
    // clear it, or the first rename below wedges every future commit
    if (Files.exists(live) && Files.exists(retired))
      deleteRecursively(retired.toFile)
    Files.move(live, retired)
    Files.move(Paths.get(next), live)
    deleteRecursively(retired.toFile)
  }

  /** Recursive directory delete shared by the commit/cleanup paths
    * (and Memo's temp-state shutdown hook). */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Crash-between-renames recovery: restore the retired state when the
    * live name is missing. No-op in every other state. */
  def recover(path: String): Unit = {
    import java.nio.file.Files
    val live = java.nio.file.Paths.get(path)
    val retired = retiredPath(path)
    if (!Files.exists(live) && Files.exists(retired))
      Files.move(retired, live)
    ()
  }
}
