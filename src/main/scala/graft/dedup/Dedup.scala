package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication family for a training-data pipeline over `documents`:
  * exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket
  * join), n-gram Jaccard verification of candidates, and SimHash banding.
  *
  * Scale design: nothing here compares all pairs, and nothing hashes a
  * shingle more than once.
  *  - Exact dedup is one hash aggregation on the fingerprint.
  *  - MinHash computes ONE md5 per distinct (doc, shingle) and derives
  *    the 8 permutation hashes arithmetically (hex-string rotations — a
  *    bijection of the hash space per permutation, so each induces an
  *    independent-enough ordering); the old shape paid 8 md5 calls per
  *    shingle, which was the dominant pipeline cost.
  *  - The hashed-shingle frame is ONE persisted lineage threaded through
  *    signatures → LSH pairs → Jaccard verification; nothing re-derives
  *    shingles from raw text twice.
  *  - SimHash banding is 16-bit bands over a 64-bit signature: 65,536
  *    buckets per band, so per-bucket candidate lists stay tiny as the
  *    corpus grows (8-bit bands cap at 256 buckets → quadratic at 100 TB).
  * All hashing is md5-hex (engine-agnostic, lexicographic min is
  * well-defined) so every stage has an exact DuckDB oracle twin.
  *
  * r16: split into five seam traits (sketch / clusters / governance /
  * incremental / spans) with zero behavior change — linearization
  * follows the original member order, so every shared CTE val
  * (SHINGLES_CTE, SIG_CTE, PAIRS_CTE) initializes before its users.
  */
object Dedup extends DedupSpans
