package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Pointer-resolved generation directories — the object-store-safe twin
  * of the two-rename compact swap (r13 verdict item 4).
  *
  * The rename-swapped compacts (VectorStore, PostingsStore) retire the
  * live directory and publish a staged rewrite with two directory
  * renames. On a flat object store a directory rename is a non-atomic
  * copy+delete per object, so the swap's crash window becomes torn state
  * instead of the absent-root instant `recover` heals. This helper keeps
  * the staged-rewrite shape but replaces the swap with the
  * VersionedStore pointer pattern at directory granularity:
  *
  *   dir/<base>            -- generation 0, the classic layout (default)
  *   dir/<base>_g<nanos>   -- later generations, immutable once published
  *   dir/_<base>_gen       -- pointer: the CURRENT generation's dir name
  *
  * The publish is ONE small-object write — atomic per-object visibility
  * on every store (a reader sees the old name or the new name, never a
  * torn directory). A crash before the pointer write leaves an orphan
  * staged generation (swept by [[sweep]]); a crash after it leaves the
  * retired generation's bytes (also swept) — garbage either way, never
  * torn data. Resolution falls back to `<base>` when no pointer exists,
  * so every store written by the rename-swapped path reads unchanged.
  *
  * Single WRITER per store mutates the pointer, same as every compact in
  * this repo ([[WriterLease]]); lease-free readers only resolve it. */
object GenDir {

  private def pointer(dir: String, base: String) =
    new Path(s"$dir/_${base}_gen")

  /** The CURRENT generation directory name for `base` under `dir`: the
    * pointer's content when one exists, else `base` itself (the classic
    * layout — fully back-compatible). Read failures on a PRESENT pointer
    * propagate: guessing `base` there could serve a retired, possibly
    * deleted generation. A pointer that VANISHES between the existence
    * probe and the open is different — the documented safe fallback (the
    * classic base name) applies, because the only writers that delete the
    * pointer ([[reset]], a rebuild) restore the classic layout. */
  def currentName(fsys: FileSystem, dir: String, base: String): String = {
    val p = pointer(dir, base)
    if (!fsys.exists(p)) base
    else {
      val raw = try {
        val in = fsys.open(p)
        try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => base }
      if (raw.isEmpty) base else raw
    }
  }

  /** The CURRENT generation directory for `base`. */
  def livePath(fsys: FileSystem, dir: String, base: String): Path =
    new Path(s"$dir/${currentName(fsys, dir, base)}")

  /** Publish `genName` as `base`'s current generation — ONE small-object
    * overwrite, atomic visibility, nothing else. The retired generation's
    * bytes are deliberately NOT deleted here: a lease-free reader that
    * resolved the old generation name an instant before this flip may
    * still be mid-scan of its files, and deleting them under it is a
    * query failure (or silent row loss under ignoreMissingFiles).
    * Retired generations are reclaimed one compact cycle later, by the
    * NEXT lease-held writer's [[sweep]] — by then every reader that
    * resolved the pre-flip pointer has long finished. */
  def publish(fsys: FileSystem, dir: String, base: String, genName: String): Unit = {
    val o = fsys.create(pointer(dir, base), true)
    try o.write(genName.getBytes("UTF-8")) finally o.close()
  }

  /** Drop generation dirs of `base` the pointer does not name — the
    * predecessors [[publish]] deferred (reclaimed here, one compact cycle
    * after retirement) and the crash garbage of an interrupted
    * pointer-mode compact (a staged but unpublished generation). Never
    * touches the live generation or the classic `<base>` dir while it is
    * live. Lease-held callers only: sweeping without the writer lease
    * could race a live compact's staging generation. */
  def sweep(fsys: FileSystem, dir: String, base: String): Unit = {
    val dirP = new Path(dir)
    if (!fsys.exists(dirP)) return
    val cur = currentName(fsys, dir, base)
    // the classic `<base>` dir is itself a retired generation once the
    // pointer names another (publish's delete crashed) — sweep it too
    fsys.listStatus(dirP).map(_.getPath)
      .filter(p => (p.getName.startsWith(s"${base}_g") || p.getName == base) &&
                   p.getName != cur)
      .foreach(p =>
        try { fsys.delete(p, true); () }
        catch { case _: java.io.IOException => () }) // next sweep retries
  }

  /** Remove the pointer itself — a REBUILD's protocol reset (the store's
    * `write`/`build` overwrite the classic `<base>` dir, so a survivor
    * pointer from a previous store here would aim reads at a deleted
    * generation). */
  def reset(fsys: FileSystem, dir: String, base: String): Unit = {
    try { fsys.delete(pointer(dir, base), false); () }
    catch { case _: java.io.IOException => () }
    sweep(fsys, dir, base)
  }
}
