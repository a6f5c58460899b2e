package graft.write;

import java.io.ByteArrayOutputStream;
import java.io.IOException;
import java.net.URI;
import java.nio.file.Files;
import java.nio.file.Paths;
import java.nio.file.StandardOpenOption;

import org.apache.hadoop.fs.FSDataOutputStream;
import org.apache.hadoop.fs.FSDataOutputStreamBuilder;
import org.apache.hadoop.fs.FileAlreadyExistsException;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * Test double for a HADOOP-19256 conditional-put store (the S3A shape on
 * Hadoop &ge; 3.4.2): declares the {@code
 * fs.option.create.conditional.overwrite} path capability, and {@code
 * createFile(...).must(cap, false)} buffers the bytes and performs the
 * exclusive publish AT CLOSE — losing the race throws, winners are
 * complete files. Backed by the local filesystem under a {@code
 * condput://host/<abs path>} URI. Java because the builder's recursive
 * generics don't override cleanly from Scala.
 */
public class CondPutFileSystem extends RawLocalFileSystem {

  public static final String CAP = "fs.option.create.conditional.overwrite";

  @Override
  public String getScheme() {
    return "condput";
  }

  @Override
  public URI getUri() {
    return URI.create("condput://host/");
  }

  @Override
  public boolean hasPathCapability(Path path, String capability) throws IOException {
    return CAP.equals(capability) || super.hasPathCapability(path, capability);
  }

  @SuppressWarnings("rawtypes")
  @Override
  public FSDataOutputStreamBuilder createFile(Path path) {
    return new CondPutBuilder(this, path);
  }

  @SuppressWarnings("rawtypes")
  static final class CondPutBuilder
      extends FSDataOutputStreamBuilder<FSDataOutputStream, CondPutBuilder> {

    private final Path target;

    CondPutBuilder(CondPutFileSystem fs, Path path) {
      super(fs, path);
      this.target = path;
    }

    @Override
    public CondPutBuilder getThisBuilder() {
      return this;
    }

    @Override
    public FSDataOutputStream build() throws IOException {
      final ByteArrayOutputStream buf = new ByteArrayOutputStream();
      final java.nio.file.Path nio = Paths.get(target.toUri().getPath());
      return new FSDataOutputStream(buf, null) {
        @Override
        public void close() throws IOException {
          super.close();
          Files.createDirectories(nio.getParent());
          try {
            // the conditional PUT: exclusive create of the complete object
            Files.write(nio, buf.toByteArray(), StandardOpenOption.CREATE_NEW);
          } catch (java.nio.file.FileAlreadyExistsException e) {
            throw new FileAlreadyExistsException(target.toString());
          }
        }
      };
    }
  }
}
