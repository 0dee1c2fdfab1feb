package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for large-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant avoids the O(n^2) all-pairs comparison by
  * bucketing (LSH bands / simhash chunks / centroid cells) so the only
  * joins are equi-joins on bucket keys — shuffle-partitionable, AQE-skew
  * splittable. Exact verification (Jaccard / Hamming / cosine) runs only
  * inside candidate buckets.
  */
object Dedup {

  /** whitespace tokens, lowercased */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** distinct word n-gram shingles */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Exact dedup via hash-groupBy: one shuffle on the 256-bit content
    * hash; keeps the smallest id per duplicate group and a BOUNDED member
    * sample (first `memberCap` ids). An unbounded `collect_list` would
    * build an O(group size) aggregation buffer — a 10^7-copy group at
    * 100 TB is one reducer OOM — so membership is ranked with a window
    * first and only ranks <= memberCap enter the list (the window's sort
    * and the groupBy share the content_sha partitioning: one exchange).
    * The full membership is recoverable by joining the corpus back on
    * content_sha. */
  def exact(df: DataFrame, textCol: String = "text",
            idCol: String = "doc_id", memberCap: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(sha2(col(textCol), 256).as("content_sha"),
      col(idCol).as("_id"))
    val ranked = keyed.withColumn("_rn",
      row_number().over(Window.partitionBy("content_sha").orderBy("_id")))
    ranked.groupBy("content_sha")
      .agg(count(lit(1)).as("n_copies"), min("_id").as("keep_id"),
        sort_array(collect_list(when(col("_rn") <= memberCap, col("_id"))))
          .as("member_sample"))
      .where(col("n_copies") > 1)
  }

  /** MinHash signature from a MATERIALIZED shingle array column: k hash
    * permutations approximated with seed-chained xxhash64
    * (`xxhash64(seed_i, shingle)`). The shingle argument must be an
    * attribute, not the shingles(...) expression — higher-order lambdas
    * re-evaluate their argument subtree per outer element, so an inlined
    * shingle expression would be recomputed k times per row. */
  def minhashSignatureFromShingles(sh: Column, k: Int = 64): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => xxhash64(i, s))))

  /** Convenience text->signature form (tests); production paths hoist the
    * shingle array first — see [[minhashLsh]]. */
  def minhashSignature(text: Column, k: Int = 64, shingleN: Int = 3): Column =
    minhashSignatureFromShingles(shingles(text, shingleN), k)

  /** MinHash + LSH banding: signatures split into `bands` bands of
    * `k/bands` rows; docs sharing any band hash become candidates; each
    * candidate pair is verified with EXACT shingle Jaccard. Returns
    * verified near-dup pairs (id_a < id_b, jaccard >= threshold).
    *
    * Plan shape at scale: one narrow pass computes signatures, one explode
    * (x bands), one shuffle on (band, band_hash), a within-bucket
    * self-join (buckets are tiny by construction), one dedup of pairs. */
  def minhashLsh(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id", k: Int = 64, bands: Int = 16,
                 threshold: Double = 0.7, shingleN: Int = 3,
                 maxBucket: Int = 200): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    // bucket rows carry ONLY (id, band, 8-byte hash): the band explode is
    // a x`bands` fan-out, so shuffling the shingle arrays through it would
    // multiply the shuffle volume by `bands` — texts re-join by id later.
    // The shingle array is materialized behind a Generate barrier first
    // (same plan-shape rule as Validator.validate: never hand an
    // expensive expression to a higher-order lambda).
    val sigs = df
      .select(col(idCol).as("id"),
        explode(array(shingles(col(textCol), shingleN))).as("sh"))
      // native codegen'd signature (bit-identical to
      // minhashSignatureFromShingles, the HOF reference impl)
      .select(col("id"),
        graft.expressions.MinHashSig.minhashSig(col("sh"), k).as("sig"))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_hash",
        aggregate(slice(col("sig"), col("band") * r + 1, lit(r)),
          col("band").cast(LongType), (acc, h) => xxhash64(acc, h)))
      .select("id", "band", "band_hash")
    // degenerate-bucket cap: a bucket of m docs yields m^2/2 candidate
    // pairs, so a near-duplicate-saturated corpus turns the self-join
    // quadratic. Buckets beyond `maxBucket` are dropped here — mass
    // duplication is exact/prefix dedup's job ([[exact]]), LSH's job is
    // the long tail. Standard practice in production MinHash-LSH.
    val bucketSizes = sigs.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n").between(2, maxBucket))
    val bucketed = sigs.join(bucketSizes, Seq("band", "band_hash"))
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    ngramJaccard(df, candidates, textCol, idCol, shingleN)
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: per bit, sum of +1/-1 across
    * token hashes, sign gives the bit. Pure higher-order expressions —
    * one LongType column, no UDF. */
  def simhash64(text: Column): Column = {
    val toks = tokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, b) => {
      val bitSum = aggregate(hashes, lit(0),
        (s, h) => s + when(call_function("shiftrightunsigned", h, b)
          .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      acc.bitwiseOR(when(bitSum > 0, call_function("shiftleft", lit(1L), b))
        .otherwise(lit(0L)))
    })
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup: docs are candidates when any of the 4 16-bit
    * chunks of their simhash match (guarantees recall for Hamming
    * distance <= 3 by pigeonhole); verified with exact Hamming. */
  def simhashDedup(df: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id",
                   maxHamming: Int = 3, maxBucket: Int = 200): DataFrame = {
    // native codegen'd expression (bit-identical to simhash64, which is
    // the interpreted higher-order-function reference implementation)
    val sigs0 = df.select(col(idCol).as("id"),
        graft.expressions.SimHash64.simhash64(col(textCol)).as("sig"))
      .withColumn("chunk", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk_val",
        call_function("shiftrightunsigned", col("sig"), col("chunk") * 16)
          .bitwiseAND(lit(0xFFFFL)))
    // degenerate-bucket cap — see [[minhashLsh]]
    val bucketSizes = sigs0.groupBy("chunk", "chunk_val")
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n").between(2, maxBucket))
    val sigs = sigs0.join(bucketSizes, Seq("chunk", "chunk_val"))
    val a = sigs.as("a"); val b = sigs.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .where(col("hamming") <= maxHamming)
  }

  /** Exact pairwise n-gram Jaccard for a (small) candidate pair table:
    * `pairs(id_a, id_b)` joined back to texts. The scale path generates
    * `pairs` with [[minhashLsh]]; this is the verification kernel alone. */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame,
                   textCol: String = "text", idCol: String = "doc_id",
                   n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a")
              .withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("id", "id_b")
              .withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** Embedding-cosine near-dup: random-hyperplane LSH (sign sketch of
    * `planes` pseudo-random hyperplanes, derived deterministically from
    * xxhash64 — no RNG state to ship) buckets vectors; exact cosine runs
    * within buckets only. */
  def embeddingNearDup(df: DataFrame, vecCol: String = "embedding",
                       idCol: String = "vec_id", planes: Int = 16,
                       threshold: Double = 0.99,
                       maxBucket: Int = 1000): DataFrame = {
    val v = col("vec")
    val sketch = aggregate(sequence(lit(0), lit(planes - 1)), lit(0L),
      (acc, p) => {
        val dot = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
            x * ((pmod(xxhash64(p, i), lit(1000L)).cast(DoubleType) / 500.0) - 1.0)),
          lit(0.0d), (s, x) => s + x)
        acc.bitwiseOR(when(dot > 0, call_function("shiftleft", lit(1L), p))
          .otherwise(lit(0L)))
      })
    val sigs0 = df.select(col(idCol).as("id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("vec"))
      .withColumn("norm", sqrt(aggregate(col("vec"), lit(0.0d),
        (s, x) => s + x * x)))
      .withColumn("bucket", sketch)
    // degenerate-bucket cap — see [[minhashLsh]]
    val bucketSizes = sigs0.groupBy("bucket")
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n").between(2, maxBucket))
    val sigs = sigs0.join(bucketSizes, Seq("bucket"))
    val a = sigs.as("a"); val b = sigs.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .withColumn("cosine",
        aggregate(zip_with(col("a.vec"), col("b.vec"), (x, y) => x * y),
          lit(0.0d), (s, x) => s + x) / (col("a.norm") * col("b.norm")))
      .where(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
