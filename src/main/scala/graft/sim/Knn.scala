package graft.sim

/** Similarity search over the `embeddings` table (Array[Float], dim 64):
  * brute-force cosine top-k as the baseline, sign-bit-bucketed (LSH/IVF
  * style) variants as the scale path, plus embedding-cosine near-dup
  * detection.
  *
  * Cross-engine determinism: the dot product / squared norm are generated
  * as an explicit 64-term left-associated sum of per-element double
  * products. float×float is exact in double (24+24 ≤ 53 mantissa bits) and
  * the addition order is fixed by the parse tree, so Spark and DuckDB
  * produce bit-identical cosines — ranking ties are then broken by vec_id.
  *
  * Scale design: queries are broadcast against the candidate stream (no
  * shuffle of the big side) for brute force; the bucketed variants turn
  * search into an equality join on a small bucket key. Norms are computed
  * once per vector, not per pair.
  *
  * Split by family (r15): [[KnnCore]] (search/dedup/retrieval),
  * [[KnnQuant]] (Lloyd trainer, SQ8, IVF-PQ and their SQL twins),
  * [[KnnMaintenance]] (attach/drift + the clustered fixture) — one
  * object, zero behavior change.
  */
object Knn extends KnnCore with KnnQuant with KnnMaintenance
