"""Deduplication operators for large-scale training-data pipelines.

All candidate generation is join/groupBy-shaped (shuffle on small keys),
never a cross product; exact verification only runs on candidate pairs.
Hash functions are plain modular arithmetic over a *term-ID dictionary*
(dense_rank of distinct tokens) so every operator is expressible in both
Spark and ANSI SQL — the DuckDB oracle computes bit-identical signatures.

Ops:
  exact_dedup           hash-groupBy on normalized text (keep-first)
  shingles              n-gram shingle set per doc (token n-grams)
  minhash_lsh_pairs     MinHash signatures + banded LSH candidate join +
                        exact Jaccard verify
  ngram_jaccard_pairs   exact n-gram Jaccard via shared-shingle join
                        (|A∩B| from the join, |A|,|B| from per-doc counts)
  simhash               64-bit SimHash per doc; near-dup = small Hamming
                        distance on bucketed prefixes

Scale notes: the shared-shingle join shuffles (shingle -> [doc]) pairs;
frequency-capped shingles (drop df > cap) bound the quadratic blowup of
hot shingles — the same Zipf-head defense as the index build's salted
term merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import tokens_col
from visionsearch_spark.docid import dense_ids

# MinHash parameters — mirrored verbatim in the DuckDB oracle SQL.
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne); products fit int64
MINHASH_A = [1_103_515_245, 1_234_567_891, 987_654_323, 1_013_904_223,
             1_664_525, 22_695_477, 214_013, 134_775_813]
MINHASH_B = [12_345, 54_321, 7_919, 104_729, 1_299_709, 15_485_863,
             32_452_843, 49_979_687]
N_HASHES = 8
N_BANDS = 4  # 2 rows per band

# SimHash draws 16 sign bits from each affine hash (low bits of a 31-bit
# value are uniform; see simhash docstring).
SIMHASH_BITS_PER_HASH = 16


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep-first exact dedup. Groups on sha2(text, 256), not the raw
    text: partial aggregation already collapses duplicates map-side, but
    the exchange KEY would still be the full document bytes — grouping on
    the 32-byte digest makes the shuffle carry (digest, id, count) only,
    ~content-size-independent at corpus scale. Collision risk is the
    SHA-256 birthday bound (~2^-128 at 10^12 docs) — treated as exact;
    the DuckDB oracle groups on the same digest."""
    return docs.groupBy(F.sha2(F.col(text_col), 256).alias("_h")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("keep_id", "n_copies")


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Distinct token n-gram shingles per doc: (id, shingle string)."""
    toks = docs.select(F.col(id_col).alias("id"),
                       tokens_col(text_col).alias("toks"))
    # sliding window over the token array, JVM-side
    # sequence(0, x) DESCENDS when x < 0 — guard docs shorter than n
    idxs = F.when(
        F.size("toks") >= n, F.sequence(F.lit(0), F.size("toks") - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = toks.select(
        "id",
        F.explode(
            F.transform(idxs, lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)))
        ).alias("shingle"),
    )
    return sh.distinct()


def shingle_ids(sh: DataFrame) -> DataFrame:
    """Dictionary-encode shingles: ids in lexicographic shingle order.

    Value-identical to ``dense_rank() OVER (ORDER BY shingle)`` (the DuckDB
    oracle's formulation) but computed with docid.dense_ids — range
    partition + per-partition row_number + driver prefix-sum — so the
    distinct-shingle table never funnels through a single window task."""
    distinct = sh.select("shingle").distinct()
    dic = dense_ids(distinct, "shingle", out_col="sid")
    return sh.join(dic, "shingle").select("id", "sid")


def minhash_signatures(sids: DataFrame) -> DataFrame:
    """(id, h0..h{N-1}): min over shingle-ids of (a*sid + b) mod p."""
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * F.col("sid") + F.lit(MINHASH_B[i]))
              % F.lit(MINHASH_PRIME)).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return sids.groupBy("id").agg(*aggs)


def _band_candidates(sig: DataFrame, cross_side: bool = False) -> DataFrame:
    """Banded-LSH candidate pairs from a minhash_signatures frame: a pair
    is a candidate iff it agrees on ALL hashes of >=1 band (equality
    join on band columns — a shuffle on tiny keys, never a cross
    product). cross_side=True restricts to pairs whose ids differ in the
    low bit (the cross_contamination encoding: corpus=even, bench=odd),
    with id_a the even side."""
    rows_per_band = N_HASHES // N_BANDS
    # One exchange instead of four: explode each signature into
    # (id, band, k0..k{r-1}) rows and self-join once on
    # (band, k0..k{r-1}) — band-tagged keys collide only within their
    # band, so the single join generates exactly the union the old
    # per-band join loop did (same candidate set, then the same
    # distinct). The self-join's two sides are the identical subtree,
    # so the right side rides a ReusedExchange; the old loop shuffled
    # eight differently-projected sides no reuse could cover.
    elems = [
        F.struct(
            F.lit(b).cast("int").alias("band"),
            *[F.col(f"h{b * rows_per_band + j}").alias(f"k{j}")
              for j in range(rows_per_band)],
        )
        for b in range(N_BANDS)
    ]
    rows = sig.select("id", F.explode(F.array(*elems)).alias("bk")) \
        .select("id", "bk.*")
    join_cols = ["band"] + [f"k{j}" for j in range(rows_per_band)]
    left = rows.select(F.col("id").alias("id_a"), *join_cols)
    right = rows.select(F.col("id").alias("id_b"), *join_cols)
    if cross_side:
        left = left.filter(F.col("id_a") % 2 == 0)
        right = right.filter(F.col("id_b") % 2 == 1)
        pair = left.join(right, join_cols).select("id_a", "id_b")
    else:
        pair = left.join(right, join_cols) \
            .filter(F.col("id_a") < F.col("id_b")) \
            .select("id_a", "id_b")
    return pair.distinct()


def _shingle_hash(s) -> "F.Column":
    """shingle string -> [0, MINHASH_PRIME), JVM-side: low 8 bytes of
    md5 read LITTLE-endian, mod p — byte-identical to
    embedding.token_hash and DuckDB's `md5_number_lower(s) %% p`
    (the proven r4 cross-engine hash). Little-endian = the hex pairs of
    chars 31..17 reversed; conv() reads them as an unsigned 64-bit,
    decimal(20,0) holds the full range."""
    hx = F.md5(s)
    le = F.concat(*[F.substring(hx, 31 - 2 * i, 2) for i in range(8)])
    return (F.conv(le, 16, 10).cast("decimal(20,0)")
            % F.lit(MINHASH_PRIME)).cast("long")


def minhash_signatures_hashed(docs: DataFrame, n: int = 3,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """(id, h0..h{N-1}) minhash signatures over DIRECTLY-HASHED shingle
    ids — no global dictionary, so the whole signature is one JVM
    expression per row (array transform + array_min): ZERO shuffle, and
    legal on a STREAMING frame (stateless row-local compute). The
    dictionary-encoded `minhash_signatures` ranks shingles
    lexicographically and therefore permutes differently; the two
    families produce slightly different band collisions and must not be
    mixed within one index. Docs with fewer than n tokens have no
    shingles -> NULL signature (callers filter; they can near-dup-match
    nothing)."""
    toks = tokens_col(text_col)
    idxs = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idxs, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    sid = F.transform(sh, _shingle_hash)

    def affine(i):
        # factory, not a default-arg lambda: F.transform passes (value,
        # index) to two-parameter lambdas, which would bind the index
        # Column over a `i=i` default
        return lambda x: (F.lit(MINHASH_A[i]) * x + F.lit(MINHASH_B[i])) \
            % F.lit(MINHASH_PRIME)

    # All N mins in ONE fold over the shingle array: N separate
    # `array_min(transform(sid, affine_i))` columns each re-evaluate the
    # whole md5 shingle-hash chain (Catalyst does not CSE common
    # subexpressions across higher-order lambdas), an 8x tax measured at
    # 32.5 s -> 4.2 s for 5000 docs. The fold carries an array of N
    # running minima; affine values lie in [0, p), so the p-valued init
    # never survives a non-empty array, and the empty case (doc shorter
    # than n tokens) returns a NULL struct whose fields expand to the
    # same all-NULL h0..h{N-1} as before. Still one stateless row-local
    # expression — streaming-legal, same values, pinned by the
    # stream-equals-batch suite.
    init = F.array(*[F.lit(MINHASH_PRIME).cast("long")
                     for _ in range(N_HASHES)])
    mins = F.aggregate(
        sid,
        init,
        lambda acc, x: F.zip_with(
            acc,
            F.array(*[affine(i)(x) for i in range(N_HASHES)]),
            lambda a, b: F.least(a, b),
        ),
        lambda acc: F.struct(*[acc[i].alias(f"h{i}")
                               for i in range(N_HASHES)]),
    )
    sig = F.when(F.size(toks) >= n, mins).otherwise(F.lit(None))
    return docs.select(F.col(id_col).alias("id"), sig.alias("_s")) \
        .select("id", "_s.*")


def minhash_pairs_hashed(docs: DataFrame, n: int = 3, min_match: int = 4,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Banded-LSH near-dup pairs over HASHED signatures with the
    SIGNATURE-based similarity estimate: n_match = #agreeing hash
    components (n_match/N_HASHES estimates Jaccard). The batch twin and
    oracle of streaming/neardup_stream.neardup_stream — same shingle
    hash, same bands, same estimate, so a chunked replay through the
    stream accumulates exactly this frame (pair set is order-free).
    Unlike minhash_lsh_pairs there is no shingle-set verification step:
    state that must verify against raw shingle sets cannot be O(sig)
    per doc, and the estimate is the standard streaming trade. Compose
    AFTER exact dedup (dedup_stream / exact_dedup): byte-identical
    texts band-agree everywhere and would pair quadratically."""
    # checkpoint: _band_candidates and the estimate join reference sig
    # from four plan branches — unmaterialized, each branch re-tokenizes
    # and re-hashes every shingle. localCheckpoint, not cache(): one
    # guaranteed computation (cached branches can race-recompute within
    # one action), a truncated logical plan (these plans carry hundreds
    # of Exchange nodes — planning itself was a cost), and blocks the
    # ContextCleaner frees with the frame instead of a CacheManager
    # entry that leaks per call. Measured 0.72x vs cache() at sf0.01.
    sig = minhash_signatures_hashed(docs, n, text_col, id_col) \
        .filter(F.col("h0").isNotNull()).localCheckpoint(eager=True)
    cands = _band_candidates(sig)
    a = sig.select(F.col("id").alias("id_a"),
                   *[F.col(f"h{i}").alias(f"ha{i}")
                     for i in range(N_HASHES)])
    b = sig.select(F.col("id").alias("id_b"),
                   *[F.col(f"h{i}").alias(f"hb{i}")
                     for i in range(N_HASHES)])
    matches = sum(
        F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", matches.cast("int").alias("n_match"))
        .filter(F.col("n_match") >= min_match)
    )


def _exact_clusters(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, rep) membership map of byte-identical-text clusters:
    rep = min id per sha2(text, 256) group (exact_dedup's keying)."""
    hashed = docs.select(F.col(id_col).alias("id"),
                         F.sha2(F.col(text_col), 256).alias("_h"))
    reps = hashed.groupBy("_h").agg(F.min("id").alias("rep"))
    return hashed.join(reps, "_h").select("id", "rep")


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, tau: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id",
                      collapse_exact: bool = True) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH, then exact Jaccard verify.

    Returns (id_a < id_b, jaccard >= tau). Candidate pairs come from
    equality of any band (groupBy band values — a shuffle on tiny keys),
    so the cross product never materializes.

    collapse_exact (default ON — the duplicate-cluster guard): d
    byte-identical docs share every band value, so uncollapsed they alone
    put d(d-1)/2 candidate pairs in every band bucket — quadratic in the
    largest dup cluster, and real crawl corpora have 10^5-copy clusters.
    The guard collapses each sha2(text) cluster to its min-id
    representative BEFORE shingling, runs candidate generation + verify
    over representatives only (the shingle DICTIONARY is unchanged —
    duplicates add no distinct shingles — so signatures and Jaccard
    values are bit-identical), then expands verified pairs back over
    cluster members: cross-cluster pairs inherit the representatives'
    jaccard (members are byte-identical to their rep), intra-cluster
    pairs are jaccard-1.0 by construction. Output is exactly the
    uncollapsed result (pinned in tests); candidate volume drops from
    O(cluster²) to O(distinct²-shaped). Intra-cluster pairs of docs too
    short to shingle are skipped, matching the uncollapsed pipeline
    (no shingles -> no candidates)."""
    # checkpoints: sids feeds minhash_signatures AND three branches of
    # _verify_jaccard (sizes, a, b) — unmaterialized, every branch
    # re-runs the tokenize -> shingle -> distinct -> dictionary -> join
    # chain, the most expensive subtree of the operator; mem likewise
    # feeds rep_ids + both expansion joins. Eager localCheckpoint (see
    # minhash_pairs_hashed for the cache()-vs-checkpoint rationale)
    # computes each subtree exactly once and keeps the downstream plan
    # small; blocks are GC-cleaned with the returned frame.
    if not collapse_exact:
        sids = shingle_ids(shingles(docs, n, text_col, id_col)).localCheckpoint(eager=True)
        sig = minhash_signatures(sids).localCheckpoint(eager=True)
        return _verify_jaccard(_band_candidates(sig), sids, tau)
    mem = _exact_clusters(docs, text_col, id_col).localCheckpoint(eager=True)
    rep_ids = mem.filter(F.col("id") == F.col("rep")) \
        .select(F.col("id").alias(id_col))
    rep_docs = docs.join(rep_ids, id_col)
    sids = shingle_ids(shingles(rep_docs, n, text_col, id_col)).localCheckpoint(eager=True)
    sig = minhash_signatures(sids).localCheckpoint(eager=True)
    rep_pairs = _verify_jaccard(_band_candidates(sig), sids, tau)
    ma = mem.select(F.col("rep").alias("id_a"), F.col("id").alias("_fa"))
    mb = mem.select(F.col("rep").alias("id_b"), F.col("id").alias("_fb"))
    cross = (
        rep_pairs.join(ma, "id_a").join(mb, "id_b")
        .select(F.least("_fa", "_fb").alias("id_a"),
                F.greatest("_fa", "_fb").alias("id_b"), "jaccard")
    )
    if tau > 1.0:
        return cross
    shingled = sids.select(F.col("id").alias("rep")).distinct()
    m2 = mem.join(shingled, "rep")
    intra = (
        m2.select(F.col("rep"), F.col("id").alias("id_a"))
        .join(m2.select(F.col("rep"), F.col("id").alias("id_b")), "rep")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(F.lit(1.0), 6).alias("jaccard"))
    )
    return cross.unionByName(intra)


def cross_contamination(corpus: DataFrame, benchmark: DataFrame,
                        n: int = 3, tau: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        collapse_exact: bool = True) -> DataFrame:
    """Train/benchmark DECONTAMINATION: near-dup pairs ACROSS two tables
    — (corpus_id, benchmark_id, jaccard >= tau) for every corpus doc
    whose token-n-gram shingle set near-duplicates a benchmark doc. The
    standard pre-training sweep that keeps eval sets out of the training
    corpus.

    Same banded MinHash-LSH machinery as minhash_lsh_pairs, with the two
    tables sharing ONE shingle dictionary (Jaccard lives in the joint
    shingle space) and candidates generated only across sides. The side
    rides in the low bit of the internal id (corpus = 2·id,
    benchmark = 2·id + 1), so the shingle/signature pipeline stays
    single-keyed — no second dictionary pass, no extra shuffle vs the
    in-corpus variant. Scale shape is identical (band-bucket joins, never
    a cross product); benchmark tables are typically tiny, so the
    cross-side band join is hash-small on one side.

    collapse_exact (default ON): the same duplicate-cluster guard as
    minhash_lsh_pairs, applied PER SIDE — byte-identical docs within a
    side collapse to their min-id representative before shingling, and
    verified cross-side representative pairs expand back over both
    clusters' members. A 10^5-copy boilerplate cluster in the corpus
    contributes one signature row instead of 10^5 identical ones, so
    in-bucket candidate mass stays linear in distinct texts. Values are
    unchanged (members are byte-identical to their reps)."""
    c = corpus.select(
        (F.col(id_col).cast("long") * 2).alias("id"),
        F.col(text_col).alias(text_col),
    )
    b = benchmark.select(
        (F.col(id_col).cast("long") * 2 + 1).alias("id"),
        F.col(text_col).alias(text_col),
    )
    if collapse_exact:
        # per-side clusters: the union would merge identical texts ACROSS
        # sides into one cluster and lose one side's representative
        # checkpoints: same re-use structure as minhash_lsh_pairs —
        # sids feeds the signatures and three _verify_jaccard branches,
        # mem_c/mem_b feed representative selection + expansion joins
        mem_c = _exact_clusters(c, text_col, "id").localCheckpoint(eager=True)
        mem_b = _exact_clusters(b, text_col, "id").localCheckpoint(eager=True)
        c_rep = c.join(mem_c.filter(F.col("id") == F.col("rep"))
                       .select("id"), "id")
        b_rep = b.join(mem_b.filter(F.col("id") == F.col("rep"))
                       .select("id"), "id")
        sids = shingle_ids(shingles(c_rep.unionByName(b_rep), n,
                                    text_col, "id")).localCheckpoint(eager=True)
        sig = minhash_signatures(sids).localCheckpoint(eager=True)
        rep_pairs = _verify_jaccard(
            _band_candidates(sig, cross_side=True), sids, tau
        )
        out = (
            rep_pairs
            .join(mem_c.select(F.col("rep").alias("id_a"),
                               F.col("id").alias("_fa")), "id_a")
            .join(mem_b.select(F.col("rep").alias("id_b"),
                               F.col("id").alias("_fb")), "id_b")
            .select(F.col("_fa").alias("id_a"),
                    F.col("_fb").alias("id_b"), "jaccard")
        )
    else:
        sids = shingle_ids(shingles(c.unionByName(b), n,
                                    text_col, "id")).localCheckpoint(eager=True)
        sig = minhash_signatures(sids).localCheckpoint(eager=True)
        out = _verify_jaccard(
            _band_candidates(sig, cross_side=True), sids, tau
        )
    return out.select(
        F.expr("id_a div 2").alias("corpus_id"),
        F.expr("(id_b - 1) div 2").alias("benchmark_id"),
        "jaccard",
    )


def ngram_overlap_contamination(corpus: DataFrame, benchmark: DataFrame,
                                n: int = 7, max_shingle_df: int = 1000,
                                text_col: str = "text",
                                id_col: str = "doc_id") -> DataFrame:
    """EXACT n-gram overlap decontamination — the GPT-3/C4-style rule
    ("drop a training doc if any of its token n-grams appears verbatim
    in an eval doc"), the stricter sibling of the Jaccard-based
    cross_contamination: one shared long n-gram is contamination even
    when whole-document similarity is low (e.g. an eval question quoted
    inside a long page). Returns (corpus_id, n_shared) — every
    contaminated corpus doc with its count of distinct shared n-grams.

    Plan: distinct n-gram shingles per side; the JOIN KEY is the
    md5 HEX of the shingle (128-bit — the 31-bit arithmetic hash would
    birthday-collide at corpus scale and silently over-drop), so the
    shuffle carries 32-byte keys instead of full n-gram strings; the
    output agg is per corpus doc, never a pair blow-up. Benchmark
    tables are small ⇒ AQE broadcasts that side. max_shingle_df caps
    Zipf-head n-grams on the BENCHMARK side (a boilerplate n-gram
    appearing in >df benchmark docs flags half the corpus and means the
    benchmark, not the corpus, has boilerplate — same rationale as
    ngram_jaccard_pairs' cap)."""
    csh = shingles(corpus, n, text_col, id_col) \
        .select(F.col("id").alias("corpus_id"),
                F.md5("shingle").alias("k"))
    bsh = shingles(benchmark, n, text_col, id_col) \
        .select("id", F.md5("shingle").alias("k"))
    bkeys = bsh.groupBy("k").agg(F.count(F.lit(1)).alias("_df")) \
        .filter(F.col("_df") <= max_shingle_df).select("k")
    return (
        csh.join(bkeys, "k")
        .groupBy("corpus_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def duplicate_spans(docs: DataFrame, length: int = 10,
                    min_occurrences: int = 2, by_hash: bool = False,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Exact duplicated-SPAN detection — the practical Spark form of
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): every maximal token
    span all of whose `length`-grams occur >= min_occurrences times in
    the corpus. Any duplicated substring of >= length tokens makes each
    of its length-grams duplicated, so the reported spans COVER every
    true duplicate of that size; a span is a maximal RUN of consecutive
    duplicated-gram start positions, so its tokens are duplicated
    wall-to-wall (no unique token is ever flagged).

    Returns (id_col, span_start, span_end, n_grams): 0-based token
    offsets, end exclusive. Occurrence counting is corpus-wide (a
    within-doc repeat of >= length tokens counts too, matching the
    suffix-array rule).

    Plan: one explode to the (doc, pos, gram) occurrence stream, one
    groupBy(gram) with map-side partials to find duplicated grams, a
    semi-join back, then the gaps-and-islands trick (pos − row_number
    per doc) collapses consecutive starts into spans — one extra
    doc-keyed shuffle, no self-join, nothing quadratic. by_hash=True
    groups on xxhash64(gram) instead of the gram string — at 100 TB the
    L-token gram strings dominate the shuffle and the 64-bit fingerprint
    is the standard trade (a collision can only ADD a false duplicated
    gram); the contract row keeps exact strings so the DuckDB twin is
    byte-equal."""
    from pyspark.sql import Window

    if length < 2:
        raise ValueError("span length must be >= 2 tokens")
    d = docs.select(F.col(id_col), tokens_col(text_col).alias("_t"))
    idxs = F.when(
        F.size("_t") >= length,
        F.sequence(F.lit(1), F.size("_t") - (length - 1)),
    ).otherwise(F.array().cast("array<int>"))
    occ = d.select(
        id_col,
        F.explode(
            F.transform(
                idxs,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(" ", F.slice("_t", i, length))
                    .alias("gram"),
                ),
            )
        ).alias("_g"),
    ).select(id_col, F.col("_g.pos").alias("pos"),
             F.col("_g.gram").alias("gram"))
    key = F.xxhash64("gram") if by_hash else F.col("gram")
    occ = occ.withColumn("_k", key).drop("gram")
    dup = (
        occ.groupBy("_k").agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_occurrences)
        .select("_k")
    )
    hits = occ.join(dup, "_k", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        hits.withColumn("_island",
                        F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "_island")
        .agg(
            (F.min("pos") - 1).cast("long").alias("span_start"),
            (F.max("pos") + length - 1).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
        .select(id_col, "span_start", "span_end", "n_grams")
    )


def dup_span_stats(docs: DataFrame, length: int = 10,
                   min_occurrences: int = 2, by_hash: bool = False,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-doc duplicated-span summary (the filter signal a training
    pipeline thresholds on): (id_col, dl, dup_tokens, dup_ratio) with
    dup_tokens = tokens covered by the UNION of the doc's duplicated
    spans and dup_ratio rounded to 6. Spans whose start-gap is smaller
    than `length` OVERLAP as token intervals (distinct islands, shared
    tokens), so the union is a real interval merge — a second
    gaps-and-islands pass on (start > running-max end), where each
    merged chain overlaps-or-touches pairwise and therefore covers
    exactly [min_start, max_end). Docs with no duplicated span report
    0/0.0."""
    from pyspark.sql import Window

    spans = duplicate_spans(docs, length=length,
                            min_occurrences=min_occurrences,
                            by_hash=by_hash, text_col=text_col,
                            id_col=id_col)
    w = Window.partitionBy(id_col).orderBy("span_start", "span_end")
    prev_max = F.max("span_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    brk = (prev_max.isNull()
           | (F.col("span_start") > prev_max)).cast("int")
    merged = (
        spans.withColumn("_brk", brk)
        .withColumn("_isl", F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(id_col, "_isl")
        .agg((F.max("span_end") - F.min("span_start")).alias("_cov"))
    )
    per_doc = merged.groupBy(id_col).agg(F.sum("_cov").alias("_dup"))
    base = docs.select(F.col(id_col),
                       F.size(tokens_col(text_col)).cast("long")
                       .alias("dl"))
    return base.join(per_doc, id_col, "left").select(
        id_col, "dl",
        F.coalesce("_dup", F.lit(0)).cast("long").alias("dup_tokens"),
        F.when(F.col("dl") > 0,
               F.round(F.coalesce("_dup", F.lit(0)) / F.col("dl"), 6))
        .otherwise(F.lit(0.0)).alias("dup_ratio"),
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, tau: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_shingle_df: int | None = 1000) -> DataFrame:
    """Exact n-gram Jaccard >= tau for pairs sharing >=1 non-ubiquitous
    shingle.

    |A∩B| = count of shared shingles (join), |A∪B| = |A|+|B|-|A∩B|.
    max_shingle_df drops ubiquitous shingles from CANDIDATE GENERATION
    (Zipf-head defense — ON by default: one shingle shared by d docs
    alone yields d(d-1)/2 candidates, quadratic in the hot-shingle df;
    at 100 TB an uncapped head shingle is a job-killer). Jaccard values
    stay exact because the verify step recomputes intersections from the
    FULL shingle sets; only pairs whose every common shingle is hotter
    than the cap are skipped — at the default cap those are boilerplate
    pairs, and the DuckDB oracle mirrors the same cap. Pass None to
    disable (test scale only)."""
    sh = shingles(docs, n, text_col, id_col)
    # checkpoint: sids feeds candidate generation (2 branches), the
    # hot-df cap, and three _verify_jaccard branches
    sids = shingle_ids(sh).localCheckpoint(eager=True)
    gen = sids
    if max_shingle_df is not None:
        hot = sids.groupBy("sid").count().filter(F.col("count") > max_shingle_df)
        gen = sids.join(hot.select("sid"), "sid", "left_anti")
    a = gen.select(F.col("id").alias("id_a"), "sid")
    b = gen.select(F.col("id").alias("id_b"), "sid")
    cands = (
        a.join(b, "sid").filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )
    return _verify_jaccard(cands, sids, tau)


def _verify_jaccard(cands: DataFrame, sids: DataFrame, tau: float) -> DataFrame:
    sizes = sids.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sids.select(F.col("id").alias("id_a"), "sid")
    b = sids.select(F.col("id").alias("id_b"), "sid")
    inter = (
        cands.join(a, "id_a").join(b, ["id_b", "sid"])
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= tau)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _star_components(edges: DataFrame, max_rounds: int = 50,
                     unpersist_handle: list | None = None) -> DataFrame:
    # unpersist_handle accepted for signature symmetry with the label
    # path; checkpointed blocks are GC-cleaned, nothing to release.
    """Connected components by LARGE-STAR / SMALL-STAR alternation (the
    CC-on-MapReduce pattern: Kiveris et al., "Connected Components in
    MapReduce and Beyond" — public algorithm), converging in O(log^2 n)
    rounds on ANY graph, including the adversarial long chains where
    min-label propagation needs O(diameter) rounds.

      large-star: every node u links each LARGER neighbor to
                  m(u) = min(Γ(u) ∪ {u})   — hangs big nodes off minima
      small-star: orient edges larger-first; every node u links each
                  smaller-or-equal neighbor AND itself to m(u)
                  — flattens local stars

    Each half-round is one groupBy-min + one join over the edge frame
    (partial-aggregated, no driver materialization); convergence is
    edge-set stability (counts equal + one exceptAll). Per-round frames
    are localCheckpoint'ed, not merely persisted: an iterative frame's
    LOGICAL plan grows multiplicatively per round even when the data is
    cached, and at tens of rounds the plan tree alone OOMs the driver
    (AQE renders an explain string per action) — checkpointing truncates
    the lineage to the materialized blocks. After convergence edges form
    stars (v, root) with root = the component min, so labels fall out
    directly. Returns (node, lbl) for every node of every input edge."""
    e = (
        edges.filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("a"),
                F.least("a", "b").alias("b"))
        .distinct().localCheckpoint(eager=True)
    )
    n_e = e.count()
    if n_e == 0:
        return edges.sparkSession.createDataFrame([], "node long, lbl long")
    for _ in range(max_rounds):
        sym = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = (
            sym.groupBy("a").agg(F.min("b").alias("mn"))
            .select("a", F.least("mn", F.col("a")).alias("m"))
        )
        large = (
            sym.filter(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        # after large-star every edge has a > b; small-star needs no
        # re-orientation
        mins2 = large.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            large.join(mins2, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(
                mins2.select("a", F.col("m").alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_small = small.count()
        stable = n_small == n_e and small.exceptAll(e).count() == 0
        e, n_e = small, n_small
        if stable:
            # final stars: every non-root appears as `a` exactly once
            # with its root as `b`; roots appear only as `b`
            return e.select(F.col("a").alias("node"),
                            F.col("b").alias("lbl")).unionByName(
                e.select(F.col("b").alias("node"),
                         F.col("b").alias("lbl")).distinct()
            )
    raise RuntimeError(
        f"_star_components did not converge in {max_rounds} "
        "rounds (theoretical bound exceeded — wiring bug)"
    )


def neardup_clusters(pairs: DataFrame, max_iter: int = 25,
                     unpersist_handle: list | None = None,
                     algorithm: str = "auto") -> DataFrame:
    """Connected components over near-dup PAIRS — the step a dedup
    pipeline actually consumes: pairs only say "a ~ b"; keep-one-per-
    group needs the transitive closure. Returns (doc_id, cluster_id)
    with cluster_id = the MIN doc id in the component, for every doc
    appearing in >=1 pair (docs in no pair are their own trivial
    cluster — callers left-join and coalesce). The canonical dedup rule
    is then "keep doc iff doc_id == cluster_id".

    Min-label propagation: every round each node adopts the min of its
    own and its neighbors' labels; converges in O(component diameter)
    rounds. Near-dup components are overwhelmingly dense (dup clusters
    are cliques through their representative; diameter 2-4), so a
    handful of rounds closes real corpora; each round is one
    partial-aggregated join+groupBy on (node, label) pairs — no driver
    materialization of edges. Convergence is detected with a changed-
    label COUNT per round (one scalar to the driver); per-round persists
    truncate the iterative lineage (Spark re-executes unpersisted
    branches per action).

    algorithm:
      "label" — min-label propagation only; raises past max_iter.
      "star"  — large-star/small-star alternation (_star_components):
                O(log^2 n) rounds on ANY graph shape; a few more Spark
                jobs per round, so propagation stays the default for
                the diameter-2-4 graphs near-dup pipelines produce.
      "auto"  (default) — propagation first; if a pathological chain
                exhausts max_iter, fall back to the star alternation
                instead of raising (label identity pinned by property
                test)."""
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    raw = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    if algorithm == "star":
        return _star_components(
            raw, unpersist_handle=unpersist_handle
        ).select(F.col("node").alias("doc_id"),
                 F.col("lbl").alias("cluster_id"))
    edges = raw.unionByName(
        raw.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()
    # per-round frames are localCheckpoint'ed (not persisted): the
    # iterative lineage grows ~3x per round even with the DATA cached,
    # and past ~20 rounds the logical-plan tree alone OOMs the driver's
    # explain rendering — checkpointing truncates the plan at the
    # materialized blocks (r5 fix, found by the long-chain fallback test)
    labels = (
        edges.select(F.col("a").alias("node")).distinct()
        .withColumn("lbl", F.col("node")).localCheckpoint(eager=True)
    )
    converged = False
    try:
        # convergence detection: labels only ever DECREASE (F.least), so
        # a round changed something iff the exact label sum dropped —
        # one trivial aggregate over the just-checkpointed frame instead
        # of the old join-with-previous + filter + count (3 exchanges
        # per round; r7). decimal(38,0) keeps the sum exact at any
        # corpus size (int64 would overflow near 10^12 docs x 10^12
        # ids).
        def _lblsum(df: DataFrame):
            return df.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]

        def _round(frame: DataFrame) -> DataFrame:
            nbr = (
                edges.join(
                    frame.select(F.col("node").alias("b"),
                                 F.col("lbl").alias("nlbl")), "b")
                .groupBy("a").agg(F.min("nlbl").alias("minn"))
            )
            return (
                frame.join(nbr.withColumnRenamed("a", "node"),
                           "node", "left")
                .select(
                    "node",
                    F.least(F.col("lbl"),
                            F.coalesce("minn", F.col("lbl"))).alias("lbl"),
                )
                .localCheckpoint(eager=True)
            )

        # pipelined convergence (r7): round i's sum-agg runs on a driver
        # thread WHILE round i+1's checkpoint job executes, so the check
        # adds zero wall time. At the fixpoint one speculative round is
        # wasted — it recomputes identical labels, results unchanged.
        # max_iter + 1 checks: convergence needs one all-quiet round
        # AFTER the last label flip, so a diameter-max_iter component
        # must not be misreported as non-converging.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            prev_sum = _lblsum(labels)
            cur = _round(labels)
            cur_fut = pool.submit(_lblsum, cur)
            for _ in range(max_iter + 1):
                nxt = _round(cur)  # speculative while cur's sum computes
                nxt_fut = pool.submit(_lblsum, nxt)
                cur_sum = cur_fut.result()
                if cur_sum == prev_sum:
                    converged = True
                    labels = cur
                    nxt_fut.result()  # drain before pool shutdown
                    break
                prev_sum = cur_sum
                cur, cur_fut = nxt, nxt_fut
        if not converged:
            if algorithm == "auto":
                # adversarial-chain fallback: the round budget bounds
                # what propagation may spend; the star alternation then
                # finishes ANY graph in O(log^2 n) rounds (finally
                # releases the propagation caches)
                return _star_components(
                    raw, unpersist_handle=unpersist_handle
                ).select(F.col("node").alias("doc_id"),
                         F.col("lbl").alias("cluster_id"))
            raise RuntimeError(
                f"neardup_clusters did not converge in {max_iter} rounds "
                "(component diameter > max_iter — raise max_iter or use "
                "algorithm='star')"
            )
        # since r5 the result rides a localCheckpoint'ed frame whose
        # blocks the ContextCleaner releases on GC — unpersist_handle is
        # kept for API compatibility (appended frames' unpersist() is a
        # harmless no-op on checkpoint-backed data)
        if unpersist_handle is not None:
            unpersist_handle.append(labels)
        return labels.select(F.col("node").alias("doc_id"),
                             F.col("lbl").alias("cluster_id"))
    finally:
        edges.unpersist()


def dedup_corpus(docs: DataFrame, n: int = 3, tau: float = 0.5,
                 text_col: str = "text", id_col: str = "doc_id",
                 max_iter: int = 25,
                 unpersist_handle: list | None = None) -> DataFrame:
    """END-TO-END near-dup corpus dedup — the composition a pipeline
    actually runs: MinHash-LSH pairs (duplicate-cluster-guarded) ->
    connected components -> keep each component's min-id representative.
    Returns the SURVIVING docs with all their columns (docs in no
    near-dup pair survive trivially). Anti-join on the non-representative
    set: the drop list is |docs in clusters| - |clusters| rows — small
    relative to the corpus, so AQE broadcasts it."""
    pairs = minhash_lsh_pairs(docs, n, tau, text_col, id_col)
    clusters = neardup_clusters(pairs, max_iter,
                                unpersist_handle=unpersist_handle)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")) \
        .select(F.col("doc_id").alias(id_col))
    return docs.join(drop, id_col, "left_anti")


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_bits: int = 64) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    EXACT, not probabilistic: the signature is split into max_hamming+1
    disjoint bit chunks; any pair within distance h differs in at most h
    chunks, so it AGREES on >=1 chunk (pigeonhole) — the per-chunk
    equality self-join therefore generates a COMPLETE candidate set, and
    bit_count(xor) verifies the exact distance. Candidate volume per
    chunk is sum over buckets of C(bucket,2): n_bits=64 with max_hamming=3
    gives 16-bit chunks (65 536 buckets per band), where 32 bits gave
    8-bit chunks whose 256 buckets accumulate quadratic collision mass at
    10^9+ docs — that's why 64 is the default and the contract config.
    Returns (id_a < id_b, hamming:int)."""
    # checkpoint: the signature (a full tokenize/tf/dictionary/
    # 64-bit-sum aggregation) is referenced by the band explode plus the
    # verify joins — unmaterialized subtree copies otherwise
    sig = simhash(docs, text_col, id_col, n_bits).localCheckpoint(eager=True)
    n_bands = max_hamming + 1
    w = -(-n_bits // n_bands)  # ceil: chunks cover all bits
    mask = (1 << w) - 1
    # Single-exchange candidate generation (same trick as
    # _band_candidates): explode to (id, band, bv) and self-join once on
    # (band, bv) — the band tag keeps chunks from colliding across
    # bands, so the one join is exactly the old per-band union, and the
    # right side reuses the left's exchange.
    elems = [
        F.struct(
            F.lit(b).cast("int").alias("band"),
            F.shiftright(F.col("simhash"), b * w).bitwiseAND(F.lit(mask))
            .alias("bv"),
        )
        for b in range(n_bands)
    ]
    rows = sig.select("id", F.explode(F.array(*elems)).alias("bk")) \
        .select("id", "bk.*")
    cands = (
        rows.select(F.col("id").alias("id_a"), "band", "bv")
        .join(rows.select(F.col("id").alias("id_b"), "band", "bv"),
              ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sig.select(F.col("id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("id").alias("id_b"), F.col("simhash").alias("sb"))
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            n_bits: int = 64) -> DataFrame:
    """SimHash over term-ID hashes: bit_i = sign of Σ_t tf(t)·(±1)_i(t).

    (±1)_i(t) is bit (i mod 16) of h_j(t) = (A[j]·tid + B[j]) mod p with
    j = i div 16. Each hash function contributes only its LOW 16 bits:
    p = 2^31-1 makes bit 31+ of any single (a·tid+b) mod p identically
    zero, so one hash cannot supply 64 independent sign bits — constant
    high bits would collapse every banded chunk over them to a single
    bucket and re-create the quadratic candidate mass the 64-bit widening
    exists to kill. ceil(n_bits/16) independent affine hashes keep every
    signature bit uniform. Identical arithmetic is reproducible in SQL
    (oracle: __spark_entry__._simhash_oracle). Returns (id, simhash:long);
    bit 63 is the two's-complement sign bit (set by adding -2^63)."""
    n_hashes = -(-n_bits // SIMHASH_BITS_PER_HASH)
    if n_hashes > len(MINHASH_A):
        raise ValueError(f"n_bits={n_bits} needs {n_hashes} hash fns, "
                         f"have {len(MINHASH_A)}")
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(tokens_col(text_col)).alias("term"))
    # checkpoint: tf feeds both the term dictionary and the signature
    # join — unmaterialized, the tokenize/explode/groupBy subtree runs
    # twice (dense_ids runs its own prefix-sum action)
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf")) \
        .localCheckpoint(eager=True)
    dic = dense_ids(tf.select("term").distinct(), "term", out_col="tid")
    h = tf.join(dic, "term").select(
        "id", "tf",
        *[((F.lit(MINHASH_A[j]) * F.col("tid") + F.lit(MINHASH_B[j]))
           % F.lit(MINHASH_PRIME)).alias(f"hj{j}")
          for j in range(n_hashes)],
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"hj{i // SIMHASH_BITS_PER_HASH}"),
                             i % SIMHASH_BITS_PER_HASH)
                .bitwiseAND(F.lit(1)) == 1,
                F.col("tf"),
            ).otherwise(-F.col("tf"))
        ).alias(f"b{i}")
        for i in range(n_bits)
    ]
    agg = h.groupBy("id").agg(*bit_sums)
    out = F.lit(0).cast("long")
    for i in range(n_bits):
        bit_val = -(1 << 63) if i == 63 else (1 << i)  # sign bit: two's compl.
        out = out + F.when(F.col(f"b{i}") > 0, F.lit(bit_val).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
    return agg.select("id", out.alias("simhash"))
