package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.DelegateToFileSystem

import java.net.URI

/** The `graft://` scheme under Hadoop's newer `AbstractFileSystem` /
  * `FileContext` API — the YARN-side registration path, mirroring the
  * reference's `CubefsAbstractFileSystem` (`CubefsAbstractFileSystem
  * .java:24-33`): a `DelegateToFileSystem` shim that wraps the same
  * [[GraftFileSystem]] impl, registered via
  * `fs.AbstractFileSystem.graft.impl` (the old API uses
  * `fs.graft.impl`). No authority-less default port — `graft://` URIs
  * always carry a volume authority, so the default port is -1 exactly
  * as the reference returns.
  *
  * Instantiated reflectively by `AbstractFileSystem.createFileSystem`
  * with (URI, Configuration) — the constructor shape is the contract.
  */
class GraftAbstractFileSystem(theUri: URI, conf: Configuration)
    extends DelegateToFileSystem(theUri, new GraftFileSystem, conf, "graft", false) {
  override def getUriDefaultPort: Int = -1
}
