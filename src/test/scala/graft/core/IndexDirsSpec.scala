package graft.core

import graft.SparkSuite
import org.apache.hadoop.fs.Path

/** Pins [[IndexDirs.publish]]'s atomic-publish contract on the local
  * FS, including the r11-advice lost-race branch: Hadoop's
  * RawLocalFileSystem.rename falls back to FileUtil.copy onto an
  * EXISTING destination directory (nesting the source inside it and
  * returning true), so a loser that blindly renamed would strand a
  * full duplicate index at `target/.build_<nonce>/` forever. The
  * pre-rename `_built` re-check makes the loser delete its temp
  * instead.
  */
class IndexDirsSpec extends SparkSuite {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_indexdirs_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("publish builds once and is idempotent") {
    val root = freshRoot("p")
    val idx  = s"$root/fam_gen1"
    var builds = 0
    def pub(): String = IndexDirs.publish(conf, idx, "fam_") { tmp =>
      builds += 1
      val fs = new Path(tmp).getFileSystem(conf)
      fs.create(new Path(tmp, "data"), true).close()
    }
    assert(pub() == idx && builds == 1)
    assert(pub() == idx && builds == 1, "second publish rebuilt")
    val fs = new Path(idx).getFileSystem(conf)
    assert(fs.exists(new Path(idx, "_built")))
    assert(fs.exists(new Path(idx, "data")))
  }

  test("a new generation garbage-collects the previous one") {
    val root = freshRoot("g")
    val fs   = new Path(root).getFileSystem(conf)
    def gen(n: Int): String =
      IndexDirs.publish(conf, s"$root/fam_gen$n", "fam_") { tmp =>
        fs.create(new Path(tmp, "data"), true).close()
      }
    gen(1); gen(2)
    assert(!fs.exists(new Path(s"$root/fam_gen1")), "stale generation kept")
    assert(fs.exists(new Path(s"$root/fam_gen2/_built")))
  }

  test("a lost publish race deletes the loser's temp — no nested copy") {
    val root = freshRoot("r")
    val idx  = s"$root/fam_gen1"
    val fs   = new Path(idx).getFileSystem(conf)
    // the build function simulates a concurrent winner completing its
    // publish while this builder is still writing: by the time this
    // builder is ready to rename, the target already exists with a
    // _built marker
    IndexDirs.publish(conf, idx, "fam_") { tmp =>
      fs.create(new Path(tmp, "loser_data"), true).close()
      fs.mkdirs(new Path(idx))
      fs.create(new Path(idx, "winner_data"), true).close()
      fs.create(new Path(idx, "_built"), true).close()
    }
    assert(fs.exists(new Path(idx, "winner_data")), "winner's copy lost")
    assert(!fs.exists(new Path(idx, "loser_data")),
      "loser's files overwrote or merged into the winner's publish")
    // the RawLocalFileSystem rename fallback would have NESTED the
    // loser's whole temp inside the target — assert nothing did
    val nested = fs.listStatus(new Path(idx))
      .map(_.getPath.getName).filter(_.contains(".build_"))
    assert(nested.isEmpty, s"loser's temp nested inside the target: " +
      nested.mkString(","))
    // and the loser's sibling temp itself is gone
    val stray = fs.listStatus(new Path(root))
      .map(_.getPath.getName).filter(_.contains(".build_"))
    assert(stray.isEmpty, s"loser's temp directory leaked: " +
      stray.mkString(","))
  }
}
