package distribot.hadoop;

import java.io.File;
import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.attribute.PosixFilePermission;
import java.util.EnumSet;
import java.util.Set;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsAction;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem whose setPermission uses java.nio instead of
 * forking a chmod process. Hadoop's stock implementation shells out
 * ("chmod xxx path") for every file create when the libhadoop native
 * library is absent, which costs a fork+exec (~5-15 ms) per created
 * file - per streaming WAL entry, per parquet part file, per
 * _SUCCESS marker. Public-knowledge fix: same permission bits via
 * Files.setPosixFilePermissions.
 */
public class NioRawLocalFileSystem extends RawLocalFileSystem {

  private static void add(Set<PosixFilePermission> set, FsAction a,
      PosixFilePermission r, PosixFilePermission w, PosixFilePermission x) {
    if (a.implies(FsAction.READ)) set.add(r);
    if (a.implies(FsAction.WRITE)) set.add(w);
    if (a.implies(FsAction.EXECUTE)) set.add(x);
  }

  @Override
  public void setPermission(Path p, FsPermission permission)
      throws IOException {
    if (permission == null) {
      return;
    }
    File f = pathToFile(p);
    Set<PosixFilePermission> perms =
        EnumSet.noneOf(PosixFilePermission.class);
    add(perms, permission.getUserAction(), PosixFilePermission.OWNER_READ,
        PosixFilePermission.OWNER_WRITE, PosixFilePermission.OWNER_EXECUTE);
    add(perms, permission.getGroupAction(), PosixFilePermission.GROUP_READ,
        PosixFilePermission.GROUP_WRITE, PosixFilePermission.GROUP_EXECUTE);
    add(perms, permission.getOtherAction(), PosixFilePermission.OTHERS_READ,
        PosixFilePermission.OTHERS_WRITE, PosixFilePermission.OTHERS_EXECUTE);
    try {
      Files.setPosixFilePermissions(f.toPath(), perms);
    } catch (UnsupportedOperationException e) {
      super.setPermission(p, permission); // non-POSIX fs: shell fallback
    }
  }
}
