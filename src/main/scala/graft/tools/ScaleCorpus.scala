package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Deterministic corpus scaler for scale-headroom benchmarking:
  * `runMain graft.tools.ScaleCorpus <srcDir> <dstDir> <factor>
  * [tables]` replicates every table (or a comma-separated subset) of
  * a driver-generated sf directory
  * (`TESTDATA.md`) `factor`× with key-shifted copies, so a 10× corpus
  * (~sf1 from sf0.1) exists to measure how each query family's wall
  * time actually grows — the cheapest way to catch a
  * driver-materialization or skew surprise an order of magnitude
  * before a user would.
  *
  * Copy discipline (copy 0 is the original, byte-for-byte):
  *  - Every primary/foreign key shifts by `i × stride(table)` where
  *    stride is the next power of 10 above the max key — referential
  *    integrity holds within each copy and copies never collide.
  *  - `documents.text` tokens get a per-copy suffix: copies are
  *    DISTINCT documents, not near-duplicates of their original, so
  *    true near-dup pairs/clusters scale LINEARLY (10× corpus → 10×
  *    pairs). Naive replication would make every doc a 10-way
  *    near-dup cluster and the pair queries' OUTPUT quadratic —
  *    measuring output explosion, not engine scaling. Vocabulary
  *    grows ~linearly, which is what real corpus growth does.
  *  - `embeddings.embedding` gets a per-copy orthogonal transform
  *    (dimension rotation by `7i` + md5-derived ±1 sign flips):
  *    orthogonal maps preserve norms and all WITHIN-copy dot products
  *    (near-dup geometry replicates exactly, 10× pairs/clusters)
  *    while cross-copy cosines stay unstructured at ANY factor —
  *    rotation alone cycles with period ≤ dim and made copies i and
  *    i+dim identical twins at factor ≥ dim.
  *  - `region`/`nation` stay fixed (TPC-H semantics) and timestamps
  *    keep their range — 10× the rows per month/day is exactly the
  *    density growth a bigger corpus brings.
  */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    // optional 4th arg: comma-separated table subset (e.g.
    // `documents`) — the fifth-decade probes scale ONE family's
    // tables where the full corpus no longer fits the disk
    val (src, dst, factorS, tableFilter) = args match {
      case Array(s, d, f)     => (s, d, f, None)
      case Array(s, d, f, ts) =>
        (s, d, f, Some(ts.split(",").map(_.trim).filter(_.nonEmpty).toSet))
    }
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    def wanted(name: String): Boolean = tableFilter.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")
      println(s"[scale] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    /** Next power of 10 strictly above the column max — keeps shifted
      * keys human-readable (copy digit in a fixed decimal place). */
    def stride(df: DataFrame, c: String): Long = {
      val m = df.agg(max(col(c).cast("long"))).head().getLong(0)
      var s = 1L
      while (s <= m) s *= 10
      s
    }

    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionByName _)

    // Per-RUN nonce (a digest of the source path): chained scaling
    // runs (sf100 = 10× the 100× corpus) COMPOSE copy transforms, and
    // since copy 0 is the identity, run 2's copies (i, 0) and (0, i)
    // would otherwise both apply exactly copy i's transform to the
    // same original — byte-identical doc/vector twins under different
    // ids, the same contamination the sign flips remove within one
    // run. Salting the sign patterns and the doc-token suffix with
    // the nonce makes each run's transform family distinct while
    // keeping the scaler fully deterministic (same src + factor →
    // same corpus); copy 0 stays byte-for-byte in every run.
    val nonce = java.security.MessageDigest.getInstance("MD5")
      .digest(s"scale-run:$src".getBytes("UTF-8"))
      .take(2).map("%02x".format(_)).mkString

    def shift(c: String, s: Long, i: Int) = (col(c) + lit(s * i)).as(c)

    // fixed dimensions: copied as-is
    if (wanted("region"))
      write(spark.read.parquet(s"$src/region.parquet"), "region")
    if (wanted("nation"))
      write(spark.read.parquet(s"$src/nation.parquet"), "nation")

    if (Seq("customer", "supplier", "part", "orders", "lineitem")
        .exists(wanted)) {
    val customer = spark.read.parquet(s"$src/customer.parquet")
    val supplier = spark.read.parquet(s"$src/supplier.parquet")
    val part     = spark.read.parquet(s"$src/part.parquet")
    val orders   = spark.read.parquet(s"$src/orders.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    val cS = stride(customer, "c_custkey")
    val sS = stride(supplier, "s_suppkey")
    val pS = stride(part, "p_partkey")
    val oS = stride(orders, "o_orderkey")

    if (wanted("customer")) write(copies(customer) { (df, i) =>
      df.select(shift("c_custkey", cS, i), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    }, "customer")
    if (wanted("supplier")) write(copies(supplier) { (df, i) =>
      df.select(shift("s_suppkey", sS, i), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
    }, "supplier")
    if (wanted("part")) write(copies(part) { (df, i) =>
      df.select(shift("p_partkey", pS, i), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))
    }, "part")
    if (wanted("orders")) write(copies(orders) { (df, i) =>
      df.select(shift("o_orderkey", oS, i), shift("o_custkey", cS, i),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }, "orders")
    if (wanted("lineitem")) write(copies(lineitem) { (df, i) =>
      df.select(shift("l_orderkey", oS, i), shift("l_partkey", pS, i),
        shift("l_suppkey", sS, i), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    }, "lineitem")
    }

    // events: normalized read (ts physical type branches per corpus)
    if (wanted("events")) {
    val events = graft.Tables.events(spark, src)
    val eS = stride(events, "event_id")
    val uS = stride(events, "user_id")
    write(copies(events) { (df, i) =>
      df.select(shift("event_id", eS, i), col("ts"), shift("user_id", uS, i),
        col("event_type"), col("value"), col("props"))
    }, "events")
    }

    if (wanted("documents")) {
    val documents = spark.read.parquet(s"$src/documents.parquet")
    val dS = stride(documents, "doc_id")
    write(copies(documents) { (df, i) =>
      val text =
        if (i == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"~$nonce$i"))), " ")
      df.select(shift("doc_id", dS, i), text.as("text"), col("lang"),
        col("source"), length(text).cast("long").as("n_chars"))
    }, "documents")
    }

    if (wanted("embeddings")) {
    val embeddings = spark.read.parquet(s"$src/embeddings.parquet")
    val vS = stride(embeddings, "vec_id")
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    // Per-copy orthogonal transform = rotation ∘ deterministic sign
    // flips. Rotation ALONE collides: `7i mod dim` has period
    // dim/gcd(7,dim), so at factor ≥ dim (the 100× corpus with
    // dim = 64) copies i and i + 64 carried IDENTICAL vectors per
    // doc — structured cross-copy cosine-1.0 twins, exactly the
    // output-explosion contamination the documents suffix exists to
    // prevent (r11's sf10 corpus had 36 such copy-pairs). A per-copy
    // ±1 diagonal from md5(copy, dim-index) is also orthogonal
    // (within-copy dot products exact-preserved), two copies share a
    // pattern with probability 2^-dim, and copy 0 stays byte-for-byte
    // the original — any factor is now safe. The per-run `nonce` in
    // the seed makes CHAINED runs safe too: without it, composed
    // copies (i, 0) and (0, i) of two runs shared the identical
    // D_i·R_i transform (copy 0 being the identity) and produced
    // cosine-1.0 twins across vec_ids.
    def copySigns(i: Int): Seq[Float] = (0 until dim).map { j =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"scale-sign:$nonce:$i:$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1f else -1f
    }
    write(copies(embeddings) { (df, i) =>
      val k = (7 * i) % dim
      val rot =
        if (k == 0) col("embedding")
        else concat(slice(col("embedding"), k + 1, dim - k),
          slice(col("embedding"), 1, k))
      val emb =
        if (i == 0) col("embedding")
        else zip_with(rot, typedlit(copySigns(i)), (x, sgn) => x * sgn)
      df.select(shift("vec_id", vS, i), emb.as("embedding"), col("label"))
    }, "embeddings")
    }

    spark.stop()
  }
}
