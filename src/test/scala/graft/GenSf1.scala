package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unofficial sf1-scale testdata generator (judge r7 #6): 10 key-shifted
  * copies of every /root/testdata/sf0.1 row table (dims pass through), so
  * the full Verify + DuckDB oracle loop can run at ~6M lineitem rows —
  * multi-row-group scans (16 MiB parquet blocks), real AQE coalescing,
  * DuckDB-side joins at size. The driver owns /root/testdata (read-only);
  * this writes /tmp/sf1, one single parquet FILE per table like the driver
  * layout, so both `graft.Verify` and `scripts/check.py` run unchanged.
  *
  * Key shifts stay FK-consistent per copy i (offset i·10⁷ applied to both
  * sides of every join the contract queries use): customer/orders on
  * custkey, orders/lineitem on orderkey, part+supplier keys shifted with
  * lineitem's references; nation/region keys untouched. Text and vector
  * grain avoid degenerate 10-wide global cliques: copy i>0 documents get a
  * deterministic POSITION-salted token permutation (multiset preserved,
  * shingle sets changed), embeddings a per-element jitter < 10⁻³ (breaks
  * exact cosine ties that would make top-k order ambiguous). The position
  * salt matters: sorting by hash(token) alone CANONICALIZES order — every
  * doc's vocabulary lands in one global order, so docs with overlapping
  * vocab share long token runs and the corpus grows ~3M jaccard-0.5 pairs
  * (measured, first r8 attempt; the engine's caps absorbed it, the flat
  * DuckDB oracles drowned). hash(token, position, copy) gives each doc an
  * independent order, keeping cross-doc shingle collisions at chance.
  *
  * Run: `sbt "Test/runMain graft.GenSf1"`, then
  * `sbt "runMain graft.Verify /tmp/sf1 /tmp/verify_sf1"` and
  * `python3 scripts/check.py /tmp/sf1 /tmp/verify_sf1`. Evidence: SURVEY §6.
  *
  * The core is [[GenScaled.gen]], shared with [[GenSf10]] (the 10× stack on
  * TOP of sf1 — 100× the driver bench scale, engine-side verification only).
  */
object GenSf1 {
  def main(args: Array[String]): Unit = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("ERROR")
    val dst = if (args.nonEmpty) args(0) else "/tmp/sf1"
    // Off is NOT a multiple of 1000: q09's synthetic coordinates derive
    // from c_custkey % 1000, so a 1000-divisible offset would give every
    // copy IDENTICAL coordinates (10× multiplicity per lattice point — the
    // first r8 attempt measured 11.17M pair rows); +1 shifts each copy's
    // lattice by ~100 m instead
    GenScaled.gen(s, "/root/testdata/sf0.1", dst, copies = 10,
      off = 10000001L, files = 1)
    s.stop()
  }
}

/** sf10: ten key-shifted copies of the GENERATED /tmp/sf1 — 60M lineitem
  * rows, 500k documents, 200k vectors; 100× the driver's bench scale.
  * Engine-side verification only (run the queries, count, time — the
  * DuckDB oracle loop is for sf0.01…sf1): see `RunQueries` with its
  * per-query timeout. Tables land as DIRECTORIES of 8 part files
  * (`<dst>/<name>.parquet/`), the multi-file layout a real corpus has —
  * Spark reads them identically.
  */
object GenSf10 {
  def main(args: Array[String]): Unit = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("ERROR")
    val src = if (args.length > 1) args(1) else "/tmp/sf1"
    val dst = if (args.nonEmpty) args(0) else "/tmp/sf10"
    require(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$src/embeddings.parquet")),
      s"source corpus $src not generated; run GenSf1 first")
    // bigger than any sf1 id (~1.02×10⁸); % 1000 == 3, so copies' q09
    // lattices stay distinct (the GenSf1 rule)
    GenScaled.gen(s, src, dst, copies = 10, off = 200000003L, files = 8)
    s.stop()
  }
}

private object GenScaled {

  def gen(s: SparkSession, src: String, dst: String, copies: Int,
          off: Long, files: Int): Unit = {
    def table(name: String): DataFrame = graft.sources.Readers.table(s, src, name)

    def writeOne(name: String, df: DataFrame): Unit = {
      val raw = s"$dst/_raw_$name"
      df.coalesce(files).write.mode("overwrite")
        // small blocks force MULTIPLE row groups per file at this size —
        // the scan regime sf0.1's one-group files never exercise
        .option("parquet.block.size", (16L * 1024 * 1024).toString)
        .parquet(raw)
      val dir = java.nio.file.Paths.get(raw)
      val target = java.nio.file.Paths.get(s"$dst/$name.parquet")
      if (files == 1) {
        // single-file layout (the driver's): move the one part file out
        // Files.list/walk streams hold a directory handle until closed —
        // scala.util.Using closes them even on a throw
        val part = scala.util.Using.resource(java.nio.file.Files.list(dir)) { st =>
          st.filter(_.toString.endsWith(".parquet")).findFirst().orElseThrow()
        }
        java.nio.file.Files.move(part, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
          st.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      } else {
        // multi-file layout: the whole directory becomes <name>.parquet
        graft.sources.Writers.deleteRecursively(target)
        java.nio.file.Files.move(dir, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      println(s"[genscaled] wrote $target")
    }

    def copiesOf(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => shift(df, i)).reduce(_ unionByName _)

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))

    // dims pass through unchanged (every copy references the same dims)
    writeOne("region", table("region"))
    writeOne("nation", table("nation"))

    writeOne("customer", copiesOf(table("customer")) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * off))
    })
    writeOne("supplier", copiesOf(table("supplier")) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * off))
    })
    writeOne("part", copiesOf(table("part")) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * off))
    })
    writeOne("orders", copiesOf(table("orders")) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * off))
        .withColumn("o_custkey", col("o_custkey") + lit(i * off))
    })
    writeOne("lineitem", copiesOf(table("lineitem")) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * off))
        .withColumn("l_partkey", col("l_partkey") + lit(i * off))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * off))
    })
    writeOne("events", copiesOf(table("events")) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * off))
        .withColumn("user_id", col("user_id") + lit(i * off))
    })
    writeOne("documents", copiesOf(table("documents")) { (df, i) =>
      val shifted = df.withColumn("doc_id", col("doc_id") + lit(i * off))
      if (i == 0) shifted
      else {
        // deterministic per-copy token permutation, POSITION-salted (see
        // the class doc): token multiset (and so most corpus statistics)
        // preserved; each doc's order is independent, so shingle sets
        // collide across docs only by chance. The salt hashes the COPY
        // OFFSET too, so stacked generations (sf1 → sf10) never reuse a
        // previous level's permutation for the same copy index.
        val toks = filter(split(col("text"), " "), t => t =!= "")
        val permuted = concat_ws(" ",
          transform(
            array_sort(transform(toks,
              (t, pos) => struct(
                xxhash64(concat(t, lit("#"), pos.cast("string"),
                  lit(s"#$i#$off"))).as("h"),
                t.as("t")))),
            st => st.getField("t")))
        // NULL texts must STAY NULL (concat_ws over a NULL array would
        // silently yield "") so copies preserve the corpus null profile
        shifted
          .withColumn("text",
            when(col("text").isNull, col("text")).otherwise(permuted))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
    })
    writeOne("embeddings", copiesOf(table("embeddings")) { (df, i) =>
      val shifted = df.withColumn("vec_id", col("vec_id") + lit(i * off))
      if (i == 0) shifted
      else {
        // per-element jitter in [0, 1e-3): identical vectors across copies
        // would tie every cosine and make top-k rank order ill-defined
        val jittered = zip_with(
          col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, j) => x + (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(1000L))
            .cast("float") / lit(1000000.0f)))
        shifted.withColumn("embedding", jittered.cast("array<float>"))
      }
    })
  }
}
