"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine (BASELINE.json extension surface).

Design for 100 TB:

- Exact + fingerprint dedup are one hash-shuffle each (groupBy on an
  md5 key) — the cheapest possible distributed dedup.
- MinHash-LSH follows the classic shingle → k affine-permutation
  min-hashes → band → bucket-join shape. Candidate generation never
  compares all pairs: only rows sharing a band hash meet, and the
  band join is an equi-join Spark shuffles on band keys. One md5 per
  shingle feeds integer (a*h+b) mod P permutations — every step is
  built-in SQL (no Python) and exactly reproducible in DuckDB.
- The Jaccard refine (reference J4 two-phase exact-refine pattern,
  docs/H3_POLYGON_ANALYSIS.md:325-355) re-checks candidates exactly.
- SimHash is a pandas UDF (bit-twiddling is not expressible sanely in
  SQL); Arrow-batched, used only to produce a 64-bit signature per
  row — linear, no pairwise work.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.storagelevel import StorageLevel

from g_etl_spark.operators.text import TOKEN_SPLIT

DEFAULT_NUM_HASHES = 8
DEFAULT_SHINGLE = 3
DEFAULT_BANDS = 4

# Classic integer min-hash: each "permutation" i is the affine map
# h -> (a_i*h + b_i) mod P over base hashes in [0, P). P = 2^31-1
# keeps every intermediate product under 2^62, so the arithmetic is
# exact in plain BIGINT in BOTH engines (no overflow, no wraparound
# semantics to reconcile). Params are fixed literals (seeded PRNG) so
# the DuckDB oracle reproduces signatures bit-for-bit.
MINHASH_P = (1 << 31) - 1
import random as _random

_salt_rng = _random.Random(1013904223)
MINHASH_SALTS: tuple[tuple[int, int], ...] = tuple(
    (_salt_rng.randrange(1, MINHASH_P), _salt_rng.randrange(0, MINHASH_P))
    for _ in range(DEFAULT_NUM_HASHES)
)
del _salt_rng


def exact_dedup(df: DataFrame, cols: Sequence[str], id_col: str) -> DataFrame:
    """Keep the min-id row per exact content hash.

    Returns the input columns of the kept rows plus ``dup_count``.
    One shuffle on the content hash; at 100 TB partition count should
    track input size (AQE coalesces the tail).
    """
    content_hash = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
    keep = (
        df.withColumn("_h", content_hash)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )
    return keep.join(df, id_col, "inner").drop("_h")


def shingles(text: Column, k: int = DEFAULT_SHINGLE) -> Column:
    """k-token shingles of lowercased text (array<string>).

    The token array is LET-BOUND through a single-element transform
    (the lambda variable `t`) before the per-shingle lambda touches
    it: HOFs are CodegenFallback with no CSE, so referencing the
    split expression directly inside the inner lambda would re-split
    the text on every element access — O(tokens²·len) per doc, the
    same trap measured and fixed in operators/text.bigrams (r12
    ×25 probe). A lambda-variable access is O(1)."""
    toks = F.split(F.lower(F.trim(text)), TOKEN_SPLIT)
    return F.get(
        F.transform(
            F.array(toks),
            lambda t: F.when(
                F.size(t) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - k),
                    lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        0,
    )


def base_shingle_hash(s: Column) -> Column:
    """Shingle -> integer in [0, MINHASH_P): the first 8 hex chars of
    md5 (32 uniform bits) parsed as an int. One md5 per shingle is
    the ONLY string hashing in the pipeline; everything downstream is
    integer arithmetic. Reproducible in DuckDB as
    ``CAST(CAST('0x' || substr(md5(s),1,8) AS UBIGINT) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % MINHASH_P


def minhash_signature(
    text: Column, num_hashes: int = DEFAULT_NUM_HASHES, k: int = DEFAULT_SHINGLE
) -> Column:
    """MinHash signature as array<long>: for permutation i, the min of
    (a_i*h + b_i) mod P over the base shingle hashes.

    The affine maps replace the earlier salted-md5 scheme: identical
    LSH guarantees (universal hashing over a prime field), but each
    extra permutation costs two integer ops per shingle instead of an
    md5 over a 38-char string — measured 6.4 s -> ~2 s on the q52
    pipeline at sf0.1. NOTE: inlining this single expression
    evaluates the base-hash transform once PER permutation
    (CodegenFallback, no CSE) — ``minhash_candidates`` stages the
    base hashes through a separate projection instead; use this form
    only where one Column expression is required.
    """
    base = F.transform(shingles(text, k), base_shingle_hash)
    return F.array(
        *[
            F.array_min(
                F.transform(base, lambda h: (h * F.lit(a) + F.lit(b)) % MINHASH_P)
            )
            for a, b in MINHASH_SALTS[:num_hashes]
        ]
    )


def band_hashes(signature: Column, bands: int = DEFAULT_BANDS) -> Column:
    """Split the array<long> signature into ``bands`` contiguous bands
    and hash each — array<string> of band keys for LSH bucketing."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    F.array_join(
                        F.transform(
                            F.slice(
                                signature,
                                b * (DEFAULT_NUM_HASHES // bands) + 1,
                                DEFAULT_NUM_HASHES // bands,
                            ),
                            lambda x: x.cast("string"),
                        ),
                        "|",
                    ),
                )
            )
            for b in range(bands)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """LSH candidate pairs: ids sharing at least one band bucket.

    PRECONDITION: ``id_col`` must be unique per row. The signature
    aggregation groups by id, so rows sharing an id would be blended
    into one signature over the UNION of their shingles (a per-row
    staged form would sign each row independently); every registry
    consumer passes a primary key, and tests pin the precondition.

    Output: (id_a, id_b, n_shared_bands) with id_a < id_b. The
    explode → self-equi-join on band key is the scale path: cost is
    Σ bucket² over buckets, not n².

    Two deliberate physical choices:
    - the shingle→hash→min reduction runs as EXPLODE + hash-aggregate,
      not as nested array lambdas. Higher-order array functions are
      CodegenFallback (interpreted, no CSE): the earlier staged-HOF
      form paid ~10 interpreted passes per document (1 shingle build +
      1 md5 map + num_hashes affine maps + num_hashes array_min) and
      was the single most expensive headline stage (guide §4.1: prefer
      built-ins with codegen). Exploding shingles to rows makes the
      md5/conv base hash and all eight (a·h+b) mod P mins top-level
      codegen'd expressions inside ONE WholeStageCodegen span; the
      groupBy's map-side partial aggregation collapses the ~tokens×
      fan-out back to one row per document before the exchange, so the
      shuffle carries |docs|·(8 longs), never |shingles| (guide §2.3
      "aggregate before you shuffle"). Only the shingle-array build
      remains a single HOF pass. Measured at sf0.1 (15k docs):
      signature stage 4.3 s → 0.7 s, q52 end-to-end 5.3 s → 1.6 s,
      bit-identical signatures (same arithmetic per element; min over
      exploded rows ≡ array_min, both null on empty docs — the min
      aggregate ignores the explode_outer null row).
    - the band relation is persisted before the self-join: Spark
      would otherwise recompute it for BOTH join branches (same
      reason you'd persist any self-joined derived relation at scale).
    """
    k = DEFAULT_SHINGLE
    toks = F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT)
    make = F.transform(
        F.sequence(F.lit(0), F.size(F.col("_toks")) - k),
        lambda i: F.concat_ws(" ", *[F.get(F.col("_toks"), i + j) for j in range(k)]),
    )
    # base_shingle_hash at TOP LEVEL (codegen'd), not inside a lambda
    base_h = (
        F.conv(F.substring(F.md5(F.col("_sh")), 1, 8), 16, 10).cast("long")
        % MINHASH_P
    )
    sig = (
        df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
        .select(
            "_id",
            F.when(F.size("_toks") >= k, make)
            .otherwise(F.array().cast("array<string>"))
            .alias("_shingles"),
        )
        # explode_outer keeps empty docs as a single null-shingle row:
        # every min aggregate sees only NULL and returns NULL — exactly
        # array_min([]) in the staged-HOF form, so band hashes for
        # empty docs are byte-identical to before
        .select("_id", F.explode_outer("_shingles").alias("_sh"))
        .select("_id", base_h.alias("h"))
        .groupBy("_id")
        .agg(*affine_min_sig_aggs()[:num_hashes])
        .select(
            "_id",
            F.array(*[F.col(f"s{i}") for i in range(num_hashes)]).alias("_sig"),
        )
        .select("_id", band_hashes(F.col("_sig"), bands).alias("_bands"))
        # materialization barrier BEFORE the explode: Generate pushdown
        # would otherwise re-inline the whole signature tree per band
        # (observed 243 md5 nodes in the optimized plan vs 39), and the
        # band self-join would recompute it for both branches.
        # persist(MEMORY_AND_DISK) rather than localCheckpoint: same barrier
        # in the plan, but lineage is KEPT — on a real cluster a lost
        # executor recomputes its partitions instead of failing the job
        # (localCheckpoint pins to executor storage with no recovery).
        .persist(StorageLevel.MEMORY_AND_DISK)
        .select("_id", F.posexplode("_bands").alias("_band_idx", "_band"))
    )
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._band_idx") == F.col("b._band_idx"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def token_set_jaccard(text_a: Column, text_b: Column) -> Column:
    """Exact Jaccard similarity of distinct-token sets."""
    ta = F.array_distinct(F.split(F.lower(F.trim(text_a)), TOKEN_SPLIT))
    tb = F.array_distinct(F.split(F.lower(F.trim(text_b)), TOKEN_SPLIT))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return F.round(inter / F.greatest(union, F.lit(1.0)), 4)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard refine →
    threshold. The refine join re-reads only candidate rows' texts
    (two broadcast-or-shuffle hash joins on ids).

    The distinct-token SET is staged per document BEFORE the join, so
    the interpreted split/lower/array_distinct chain runs |docs| times
    instead of 2×|candidate pairs| times (candidates outnumber docs
    whenever dups exist — measured 19.5k pairs over 15k docs at
    sf0.1); the per-pair work is only array_intersect/array_union
    over the prebuilt sets. Same arithmetic as token_set_jaccard,
    identical output."""
    cand = minhash_candidates(df, id_col, text_col)
    tset = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT))
    da = df.select(F.col(id_col).alias("id_a"), tset.alias("_ta"))
    db = df.select(F.col(id_col).alias("id_b"), tset.alias("_tb"))
    inter = F.size(F.array_intersect(F.col("_ta"), F.col("_tb"))).cast("double")
    union = F.size(F.array_union(F.col("_ta"), F.col("_tb"))).cast("double")
    scored = cand.join(da, "id_a").join(db, "id_b").select(
        "id_a",
        "id_b",
        "n_shared_bands",
        F.round(inter / F.greatest(union, F.lit(1.0)), 4).alias("jaccard"),
    )
    # filter on the projected attribute — filtering on the expression
    # would re-evaluate the (interpreted) array ops per row
    return scored.filter(F.col("jaccard") >= threshold)


def simhash64(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per row via an Arrow-batched pandas UDF.

    Linear in rows; near-dup lookup then groups by signature or by
    rotated prefix bands (Hamming-ball search). Python is unavoidable
    here (per-bit vote accumulation), so it is vectorized per batch.
    """

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            votes = [0] * 64
            for tok in (t or "").lower().split():
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                for bit in range(64):
                    votes[bit] += 1 if (h >> bit) & 1 else -1
            sig = 0
            for bit in range(64):
                if votes[bit] > 0:
                    sig |= 1 << bit
            # keep within signed int64 for Spark LongType
            if sig >= 1 << 63:
                sig -= 1 << 64
            out.append(sig)
        return pd.Series(out)

    return df.select(F.col(id_col), _simhash(F.col(text_col)).alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs via PREFIX FILTERING
    (the PPJoin family) — the exact set-similarity join, never an
    all-pairs product.

    Each doc's sorted distinct n-gram set of size s keeps a prefix of
    the first ``s - ceil(t*s) + 1`` grams: any pair with Jaccard >= t
    provably shares at least one prefix gram under a consistent
    global token order, so candidates are found by EXPLODING prefixes
    and equi-joining on the gram. A size-ratio filter
    (t*|b| <= |a| <= |b|/t) prunes further, then candidates are
    refined with the exact Jaccard. Zero false negatives — the
    result equals brute force (oracle-verified).

    Prefix ORDER matters for cost (not correctness): any consistent
    global order is exact, but lexicographic prefixes keep the
    COMMON grams (" the", "and ") whose candidate lists explode as
    Σ df². Grams are therefore ordered by ascending document
    frequency — prefixes hold each doc's RAREST grams (measured
    20.7 s → ~2 s at sf0.001). The DF pass is one extra
    explode+count shuffle, amortizable at scale by sampling or a
    frequency sketch.

    Same physical discipline as minhash: array exprs staged through
    projections (CodegenFallback, no CSE) and the gram relation
    persisted before the self-join (lineage-safe barrier).
    """
    s = F.lower(F.trim(F.col(text_col)))
    grams = (
        df.select(F.col(id_col).alias("_id"), s.alias("_s"))
        .select(
            "_id",
            F.when(
                F.length("_s") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.length("_s") - n + 1),
                    lambda i: F.col("_s").substr(i, F.lit(n)),
                ),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("_grams"),
        )
        .select("_id", F.array_distinct("_grams").alias("_g"))
        .select("_id", "_g", F.size("_g").alias("_sz"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # global document frequency per gram -> rarest-first total order
    df_tab = (
        grams.select(F.explode("_g").alias("_gram"))
        .groupBy("_gram")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    ranked = (
        grams.select("_id", "_sz", F.explode("_g").alias("_gram"))
        .join(df_tab, "_gram")
        .groupBy("_id", "_sz")
        .agg(F.array_sort(F.collect_list(F.struct("_df", "_gram"))).alias("_r"))
    )
    prefix_len = (F.col("_sz") - F.ceil(F.lit(threshold) * F.col("_sz")) + 1).cast("int")
    pref = ranked.select(
        "_id", "_sz",
        F.posexplode(F.slice("_r", F.lit(1), prefix_len)).alias("_pos", "_rg"),
    ).select("_id", "_sz", "_pos", F.col("_rg._gram").alias("_gram"))
    a = pref.select(
        F.col("_id").alias("id_a"), F.col("_sz").alias("_sza"),
        F.col("_pos").alias("_pa"), "_gram",
    )
    b = pref.select(
        F.col("_id").alias("id_b"), F.col("_sz").alias("_szb"),
        F.col("_pos").alias("_pb"), "_gram",
    )
    # PPJoin positional filter: a shared gram at (0-based) positions
    # (i, j) of the DF-ordered gram lists caps the achievable overlap.
    # The order is GLOBAL and consistent, so any shared gram earlier
    # than this one sits before position i in a AND before j in b —
    # at most min(i, j) of them — and every later shared gram sits in
    # both suffixes — at most min(sz_a-i, sz_b-j). Hence
    #   overlap <= min(i, j) + min(sz_a-i, sz_b-j),
    # while Jaccard >= t needs overlap >= ceil(t/(1+t)*(sz_a+sz_b)).
    # For a truly-similar pair the prefix guarantee puts SOME shared
    # gram in both prefixes, and at that row the bound >= the true
    # overlap, so per-row filtering before the distinct keeps zero
    # false negatives (oracle-verified) while dropping deep-position
    # common-gram matches the size filter alone admits (the
    # low-entropy-corpus candidate pressure noted in NEXT.md).
    # Measured at sf0.01: 25,170 -> 24,643 candidates (~2%) — modest
    # HERE because the synthetic corpus has ~2k distinct 5-grams, so
    # prefixes are long and the min(i,j) slack is wide; on natural
    # text (rare grams -> short effective prefixes, early positions)
    # the same bound prunes far harder. Cost: two ints through the
    # prefix shuffle, no extra stage.
    # (The naive bound WITHOUT the min(i,j) term is exact only in
    # PPJoin's sequential accumulate-as-you-scan form; relationally
    # it rejects true pairs whose first shared gram falls outside a
    # prefix — measured: 1 lost pair at sf0.01.)
    # epsilon guards the double rounding of t/(1+t): for t=0.8 the
    # representable value sits ABOVE the exact 4/9, and a bare ceil
    # would over-require by 1 exactly at Jaccard == t (a real lost
    # pair at sf0.01).
    overlap_needed = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("_sza") + F.col("_szb"))
        - F.lit(1e-9)
    )
    overlap_bound = F.least(F.col("_pa"), F.col("_pb")) + F.least(
        F.col("_sza") - F.col("_pa"), F.col("_szb") - F.col("_pb")
    )
    cand = (
        a.join(b, "_gram")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_sza") >= F.ceil(F.lit(threshold) * F.col("_szb")))
            & (F.col("_szb") >= F.ceil(F.lit(threshold) * F.col("_sza")))
            & (overlap_bound >= overlap_needed)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ga = grams.select(F.col("_id").alias("id_a"), F.col("_g").alias("_ga"))
    gb = grams.select(F.col("_id").alias("id_b"), F.col("_g").alias("_gb"))
    scored = (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("_ga", "_gb")).cast("double")
                / F.size(F.array_union("_ga", "_gb")),
                4,
            ).alias("jaccard"),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold)


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold.

    Brute-force O(n²) cross join — correct baseline for modest n; the
    scale path buckets by sign-random-projection first (see
    operators/similarity.srp_bucket_pairs) so only same-bucket pairs
    are compared.
    """
    norm = _l2_norm(F.col(vec_col))
    v = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
        norm.alias("_n"),
    )
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot / (F.col("_na") * F.col("_nb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _l2_norm(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )


def chunk_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 20,
) -> DataFrame:
    """Cross-corpus CHUNK-level dedup with document reconstruction —
    the paragraph-dedup shape of CCNet/RefinedWeb (dedup below
    document granularity so boilerplate shared across distinct pages
    is dropped once), chunked by token count because this corpus has
    no newline structure.

    Every ``chunk_tokens``-token span keeps exactly its FIRST
    occurrence corpus-wide (order: (doc_id, chunk_idx) ascending);
    later occurrences are cut and each doc is re-assembled from its
    surviving chunks. Returns (id, n_chunks, n_kept, kept_text).

    Scale: chunking is map-only (explode), the first-occurrence
    choice is one groupBy-min on the chunk hash, reassembly one
    groupBy on doc id — two narrow-keyed shuffles total, both
    hash-partitioned, no pairwise work anywhere.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT)
    t = df.select(F.col(id_col).alias("_id"), toks.alias("_t"))
    n_chunks = F.greatest(
        F.ceil(F.size("_t") / F.lit(chunk_tokens)).cast("int"), F.lit(1)
    )
    chunks = t.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice("_t", i * chunk_tokens + 1, F.lit(chunk_tokens)), " "
                ),
            )
        ).alias("_idx", "_chunk"),
    ).select(
        "_id",
        "_idx",
        "_chunk",
        # first-occurrence order = (doc id, chunk position), as a
        # struct so it works for ANY orderable id type and any chunk
        # count (an arithmetic id*K+idx encoding would collide past K
        # chunks and null out on string ids)
        F.struct("_id", "_idx").alias("_rank"),
        F.md5("_chunk").alias("_h"),
    )
    # chunks feeds THREE consumers (first-occurrence agg, kept-join
    # probe, per-doc totals): persist or the explode+md5 map stage
    # runs three times (same discipline as minhash_candidates above)
    chunks = chunks.persist(StorageLevel.MEMORY_AND_DISK)
    firsts = chunks.groupBy("_h").agg(F.min("_rank").alias("_first"))
    kept = chunks.join(firsts, "_h").filter(F.col("_rank") == F.col("_first"))
    per_doc = chunks.groupBy("_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    kept_doc = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "_chunk"))),
                lambda x: x["_chunk"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return (
        per_doc.join(kept_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_chunks",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
    )


def affine_min_sig_aggs() -> list[Column]:
    """The MINHASH_SALTS affine min-hash AGGREGATES over a base-hash
    column named ``h``, aliased s0..s{n-1} — the signature reduction
    every custom-base-hash MinHash variant shares (q368's
    occurrence-weighted hashes, q373's b-bit truncation study,
    q375's bipartite decontamination). One definition so a salt or
    permutation-count change cannot drift between the variants and
    `minhash_candidates` (which inlines the same maps over its
    staged text path).
    """
    return [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % MINHASH_P).alias(f"s{i}")
        for i, (a, b) in enumerate(MINHASH_SALTS)
    ]


def sig_band_struct_array(
    bands: int = DEFAULT_BANDS, rows_per_band: int = 2
) -> Column:
    """explode-ready array<struct(band_idx, band)> over signature
    columns s0..s{bands·rows_per_band−1}: band b hashes its
    contiguous signature rows as md5('b|s_{rb}|…') — the banded-LSH
    bucket key format shared by q368/q373/q375 (and mirrored
    verbatim in their DuckDB oracles)."""
    return F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(b).cast("string"),
                    *[
                        F.col(f"s{rows_per_band * b + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("band"),
        )
        for b in range(bands)
    ])
