package graft.write;

import java.io.ByteArrayOutputStream;
import java.io.IOException;
import java.net.URI;

import org.apache.hadoop.fs.FSDataOutputStream;
import org.apache.hadoop.fs.FSDataOutputStreamBuilder;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * Conditional-put store whose publish-at-close always FAILS with a
 * configurable {@link IOException} message ({@code {target}} expands to
 * the path being written) — exercises the commit dispatch's lost-race
 * classification: a precondition-looking failure naming the commit target
 * is a collision, the same-looking message about a DIFFERENT path must
 * propagate as the real store error it is. Java for the same builder-
 * generics reason as {@link CondPutFileSystem}.
 */
public class FlakyCondPutFileSystem extends RawLocalFileSystem {

  /** Message template for the close()-time IOException. */
  public static volatile String failureMessage = "";

  @Override
  public String getScheme() {
    return "condflaky";
  }

  @Override
  public URI getUri() {
    return URI.create("condflaky://host/");
  }

  @Override
  public boolean hasPathCapability(Path path, String capability) throws IOException {
    return CondPutFileSystem.CAP.equals(capability) || super.hasPathCapability(path, capability);
  }

  @SuppressWarnings("rawtypes")
  @Override
  public FSDataOutputStreamBuilder createFile(Path path) {
    return new FlakyBuilder(this, path);
  }

  @SuppressWarnings("rawtypes")
  static final class FlakyBuilder
      extends FSDataOutputStreamBuilder<FSDataOutputStream, FlakyBuilder> {

    private final Path target;

    FlakyBuilder(FlakyCondPutFileSystem fs, Path path) {
      super(fs, path);
      this.target = path;
    }

    @Override
    public FlakyBuilder getThisBuilder() {
      return this;
    }

    @Override
    public FSDataOutputStream build() throws IOException {
      final ByteArrayOutputStream buf = new ByteArrayOutputStream();
      return new FSDataOutputStream(buf, null) {
        @Override
        public void close() throws IOException {
          super.close();
          throw new IOException(
              failureMessage.replace("{target}", target.toString()));
        }
      };
    }
  }
}
