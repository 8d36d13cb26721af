package graft.core

import java.nio.file.{Files, Path, StandardCopyOption}

/** Crash-safe small-file writes for the harness mains (Verify's
  * manifest, Bench's full per-query record): write a sibling temp file,
  * then ATOMIC_MOVE over the target, so a driver stage-budget kill
  * landing mid-write can never leave a truncated, unparseable artifact
  * — the exact ambiguity these records exist to remove.
  */
object AtomicFiles {
  def writeString(target: Path, body: String): Unit = {
    Option(target.getParent).foreach(Files.createDirectories(_))
    val tmp = target.resolveSibling("." + target.getFileName + ".tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
