package distribot.hadoop;

import org.apache.hadoop.fs.LocalFileSystem;

/** LocalFileSystem (checksummed local fs, the default for file://)
 *  backed by the fork-free NioRawLocalFileSystem. */
public class NioLocalFileSystem extends LocalFileSystem {
  public NioLocalFileSystem() {
    super(new NioRawLocalFileSystem());
  }
}
