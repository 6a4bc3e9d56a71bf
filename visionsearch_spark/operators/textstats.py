"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprinting. Everything is built-in-function arithmetic
(WholeStageCodegen) — no Python in the hot path — and every op has an
exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import tokens_col
from visionsearch_spark.docid import dense_ids

FP_PRIME = 2_147_483_647
FP_MULT = 1_103_515_245

# tiny marker vocabularies for the n-gram/stopword language heuristic;
# deterministic tie-break: alphabetical language code.
LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit"],
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour"],
}
STOPWORDS = LANG_MARKERS["en"]


def _count_in(tokens: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(words)))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-token language scoring; 'und' (undetermined) when no marker
    hits. Deterministic argmax with alphabetical tie-break."""
    toks = tokens_col(text_col)
    d = docs.select(F.col(id_col), toks.alias("_t"))
    scored = d.select(
        id_col,
        *[_count_in(F.col("_t"), ws).alias(f"s_{lang}")
          for lang, ws in sorted(LANG_MARKERS.items())],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = F.lit("und")
    # alphabetical-first argmax: evaluate in reverse so earlier langs win ties
    for lg in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"s_{lg}") == best), F.lit(lg)
        ).otherwise(pred)
    return scored.select(id_col, pred.alias("pred_lang"))


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score in [0,1]:
    token count band, mean token length band, stopword presence,
    terminal punctuation. All pure column arithmetic."""
    toks = tokens_col(text_col)
    d = docs.select(
        F.col(id_col),
        F.col(text_col),
        toks.alias("_t"),
    ).select(
        id_col,
        F.size("_t").alias("n_tokens"),
        (F.length(text_col)
         - F.length(F.regexp_replace(F.col(text_col), "[.!?]", ""))
         ).alias("n_punct"),
        F.length(text_col).alias("n_chars"),
        _count_in(F.col("_t"), STOPWORDS).alias("n_stop"),
    )
    mean_tok_len = F.when(
        F.col("n_tokens") > 0,
        (F.col("n_chars") - F.col("n_tokens") + 1) / F.col("n_tokens"),
    ).otherwise(F.lit(0.0))
    score = (
        F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 1000), 0.4)
        .otherwise(0.0)
        + F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), 0.2).otherwise(0.0)
        + F.when(F.col("n_stop") > 0, 0.2).otherwise(0.0)
        + F.when(F.col("n_punct") > 0, 0.2).otherwise(0.0)
    )
    return d.select(
        id_col, "n_tokens", "n_punct", "n_stop",
        F.round(score, 6).alias("quality"),
    )


def token_length_stats(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Corpus token-length distribution (the sizing numbers a pipeline
    reads before choosing context windows / packing): count, mean,
    min/max, exact linear-interpolated p50/p90/p99. One scan, one
    partial-aggregated reduce; `percentile` is exact (matches DuckDB's
    quantile_cont interpolation) — percentile_approx would not oracle."""
    d = docs.select(F.size(tokens_col(text_col)).alias("n_tokens"))
    pct = F.expr("percentile(n_tokens, array(0.5, 0.9, 0.99))")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.round(pct[0], 6).alias("p50"),
        F.round(pct[1], 6).alias("p90"),
        F.round(pct[2], 6).alias("p99"),
    )


# whitespace as an EXPLICIT class, not \s: Java regex (Spark) counts
# \x0B in \s, RE2 (the DuckDB twin) does not — the explicit class is the
# Java set spelled out, so both engines tokenize \x0B-bearing docs
# identically and the operator's exact-parity contract holds on real data
BPE_PIECE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\x0b\f\r]"
BPE_CHARS_PER_TOKEN = 4


def llm_token_estimate(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """BPE-ish LLM token count estimate, fully in JVM codegen:
    pieces = regex runs (letter runs | digit runs | single punct — the
    GPT-2 pre-tokenizer shape minus its lookarounds, which RE2-based SQL
    engines can't run), each piece costing ceil(len/4) tokens (BPE splits
    long words into ~4-char subwords; short pieces cost 1). A deliberate
    deterministic ESTIMATOR, not a tokenizer: the pipeline use is sizing/
    budgeting (packing, context-window fit) where cross-engine
    reproducibility beats vocab fidelity. One scan, no shuffle; the
    alternation's branches are disjoint so Java-regex (leftmost-first)
    and RE2 (DuckDB twin) match identically."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PIECE_RE), 0)
    est = F.aggregate(
        F.transform(
            pieces,
            lambda p: F.ceil(F.length(p) / F.lit(BPE_CHARS_PER_TOKEN)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(id_col, est.alias("est_tokens"))


def source_mixture(docs: DataFrame, text_col: str = "text",
                   source_col: str = "source") -> DataFrame:
    """Training-mixture accounting: per source, document count, token
    count, and share of corpus tokens — the inputs a mixture-weighting /
    sampling-ratio step consumes. One scan + one partial-aggregated
    groupBy; the share is computed with a global window over the
    AGGREGATED frame only (cardinality = number of sources, bounded by
    construction — never the row count), so the single-partition window
    task holds a handful of rows at any corpus size. Returns
    (source, n_docs, n_tokens, token_share)."""
    from pyspark.sql import Window

    agg = (
        docs.select(source_col,
                    F.size(tokens_col(text_col)).alias("n_tokens"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    return agg.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(w), 6)
        .alias("token_share"),
    )


def pack_documents(docs: DataFrame, window: int = 512,
                   text_col: str = "text", id_col: str = "doc_id",
                   unpersist_handle: list | None = None) -> DataFrame:
    """Greedy sequence packing for training: assign docs (in id order) to
    context-window bins of `window` tokens with BOUNDED overflow —
    bin_id = (tokens_before_this_doc) DIV window, so each bin holds at
    most `window + max_doc_tokens - 1` tokens and every bin except
    possibly the last holds at least `window - max_doc_tokens + 1`. The
    fill-then-cut rule (vs exact first-fit, whose bin state is a
    sequential fold no engine parallelizes) is what makes the operator
    scale: the only cross-row dependency is a prefix sum, computed with
    the dense_ids two-phase recipe — no global window, no funnel task
    (docid.prefix_sum). Integer DIV both here and in the DuckDB twin:
    no float rounding at bin boundaries. Returns
    (doc_id, n_tokens, bin_id).

    prefix_sum persists its ranged frame (sampling determinism); pass
    `unpersist_handle` (a list) to receive that persisted DataFrame and
    unpersist it once the result is materialized — the dense_ids
    convention; long-lived sessions leak cached partitions otherwise."""
    from visionsearch_spark.docid import prefix_sum

    d = docs.select(id_col, F.size(tokens_col(text_col)).alias("n_tokens"))
    c = prefix_sum(d, id_col, "n_tokens", out_col="_cum",
                   unpersist_handle=unpersist_handle)
    return c.select(
        id_col,
        "n_tokens",
        F.expr(f"(_cum - n_tokens) div {int(window)}").alias("bin_id"),
    )


def deterministic_sample(docs: DataFrame, rate: float = 0.1,
                         id_col: str = "doc_id",
                         mult: int = FP_MULT, offset: int = 12345,
                         prime: int = FP_PRIME) -> DataFrame:
    """Reproducible sampling: keep a row iff
        (mult·id + offset) mod prime  <  prime·rate.
    Pure modular arithmetic — the sampling decision is portable across
    Spark / SQL / Python bit-for-bit, unlike seeded RNG sampling whose
    stream is implementation-defined (and in Spark partitioning-
    dependent). The filter is a codegen'd column predicate: prunes at the
    scan, no shuffle, and the SAME rows are selected at every scale-out."""
    h = (F.lit(mult) * F.col(id_col) + F.lit(offset)) % F.lit(prime)
    return docs.filter(h < F.lit(int(prime * rate)))


def training_set_filter(docs: DataFrame, min_quality: float = 0.6,
                        langs: tuple[str, ...] = ("en",),
                        min_tokens: int = 5, max_tokens: int = 1000,
                        text_col: str = "text", id_col: str = "doc_id"
                        ) -> DataFrame:
    """End-to-end training-set selection: keep-first exact dedup ∧
    language allowlist ∧ quality floor ∧ token-count band — the composite
    every LLM-data pipeline runs before tokenization. One plan: three
    column-arithmetic passes joined on the id, dedup's groupBy being the
    only extra shuffle; at 100 TB everything is partial-aggregated and
    AQE-broadcast where small. Returns (doc_id, pred_lang, n_tokens,
    quality) for the surviving docs."""
    from visionsearch_spark.operators.dedup import exact_dedup

    q = quality_score(docs, text_col, id_col).select(
        id_col, "n_tokens", "quality"
    )
    lang = lang_id(docs, text_col, id_col)
    keep = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return (
        q.join(lang, id_col).join(keep, id_col)
        .filter(
            F.col("pred_lang").isin(list(langs))
            & (F.col("quality") >= min_quality)
            & F.col("n_tokens").between(min_tokens, max_tokens)
        )
        .select(id_col, "pred_lang", "n_tokens", "quality")
    )


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals — the standard
    crawl-quality filters that catch boilerplate/spam before training:
      dup_2gram_frac / dup_3gram_frac — fraction of n-gram OCCURRENCES
        that are duplicates: 1 - distinct/total (0.0 for docs too short
        to have any n-gram);
      top_term_frac — the most frequent token's share of the doc length
        (a 0.3+ value is a repetition loop, not language).
    The n-gram fractions are pure JVM array arithmetic (no shuffle); the
    top-term count is one partial-aggregated explode+groupBy whose
    shuffle rows are (doc_id, term) pairs, the same shape as the index
    build's term fan-out. All divisions are int/int -> double in both
    engines, so the DuckDB twin matches bit-wise."""
    toks = tokens_col(text_col)
    d = docs.select(F.col(id_col), toks.alias("_t"))

    def dup_frac(n: int):
        idxs = F.when(
            F.size("_t") >= n, F.sequence(F.lit(0), F.size("_t") - n)
        ).otherwise(F.array().cast("array<int>"))
        grams = F.transform(
            idxs, lambda i: F.concat_ws(" ", F.slice("_t", i + 1, n))
        )
        total = F.size(grams)
        return F.when(
            total > 0,
            F.round(F.lit(1.0) - F.size(F.array_distinct(grams)) / total, 6),
        ).otherwise(F.lit(0.0))

    base = d.select(
        id_col,
        F.size("_t").alias("_dl"),
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
    )
    tf = (
        d.select(id_col, F.explode("_t").alias("_term"))
        .groupBy(id_col, "_term").agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col).agg(F.max("_c").alias("_max_tf"))
    )
    return base.join(tf, id_col, "left").select(
        id_col,
        "dup_2gram_frac",
        "dup_3gram_frac",
        F.when(
            F.col("_dl") > 0, F.round(F.col("_max_tf") / F.col("_dl"), 6)
        ).otherwise(F.lit(0.0)).alias("top_term_frac"),
    )


# PII patterns — RE2-safe (no lookarounds/backrefs) and with whitespace
# spelled out, so Java regex (Spark) and RE2 (DuckDB twin) match
# identically. Scrub ORDER matters and is part of the spec: URLs first
# (an email inside a URL query string must count once, as a URL), then
# emails, then phones; replacement tokens contain no digits or '@', so
# later passes can never match inside earlier redactions.
PII_URL_RE = r"https?://[^ \t\n\x0b\f\r]+"
PII_EMAIL_RE = r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z][a-zA-Z]+"
PII_PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
PII_STEPS = [  # (column suffix, pattern, replacement) in scrub order
    ("urls", PII_URL_RE, "<URL>"),
    ("emails", PII_EMAIL_RE, "<EMAIL>"),
    ("phones", PII_PHONE_RE, "<PHONE>"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact URLs, emails and phone numbers — the standard PII/link
    scrub a training pipeline runs before tokenization. Returns
    (doc_id, n_urls, n_emails, n_phones, clean_text). Counts are taken
    on the progressively scrubbed text (an email inside a URL counts as
    the URL it rode in on, not twice). Pure codegen'd regexp_count /
    regexp_replace — one scan, no shuffle, no Python."""
    cur = F.col(text_col)
    counts = []
    for name, pat, rep in PII_STEPS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, rep)
    return docs.select(F.col(id_col), *counts, cur.alias("clean_text"))


def mixture_weights(docs: DataFrame, targets: dict[str, float],
                    text_col: str = "text", source_col: str = "source"
                    ) -> DataFrame:
    """Per-source resampling weight for hitting a TARGET token mixture:
    weight = target_share / actual token_share — the multiplier a
    mixture sampler applies to each source's sampling rate (>1 =
    oversample, <1 = downsample, 0 = excluded from the target mix).

    One aggregation (source_mixture) runs EAGERLY here and its bounded
    result (one row per source) is collected so that (a) a `targets` key
    naming no corpus source fails loudly — a typo'd source would
    otherwise silently vanish and the emitted weights would no longer
    sum to the intended mix — and (b) the corpus is scanned exactly once
    even with the validation (validating on the lazy plan would re-run
    the scan at the consumer's action). A source whose docs all tokenize
    to zero tokens gets weight NULL (no resampling rate can give an
    empty source a token share; ANSI mode would otherwise raise
    DIVIDE_BY_ZERO mid-job)."""
    spark = docs.sparkSession
    rows = [tuple(r) for r in
            source_mixture(docs, text_col, source_col).collect()]
    observed = {r[0] for r in rows}
    missing = sorted(set(targets) - observed)
    if missing:
        raise ValueError(
            f"mixture targets name sources absent from the corpus: "
            f"{missing} (observed: {sorted(observed)})"
        )
    mix = spark.createDataFrame(
        rows,
        f"{source_col} string, n_docs bigint, n_tokens bigint, "
        "token_share double",
    )
    tgt = F.lit(0.0)
    for src, share in sorted(targets.items()):
        tgt = F.when(F.col(source_col) == src, F.lit(float(share))) \
            .otherwise(tgt)
    return mix.select(
        source_col, "n_docs", "n_tokens", "token_share",
        F.when(F.col("token_share") > 0,
               F.round(tgt / F.col("token_share"), 6))
        .otherwise(F.lit(None).cast("double")).alias("weight"),
    )


def mixture_sample(docs: DataFrame, targets: dict[str, float],
                   base_rate: float = 0.5,
                   text_col: str = "text", source_col: str = "source",
                   id_col: str = "doc_id",
                   mult: int = FP_MULT, offset: int = 12345,
                   prime: int = FP_PRIME) -> DataFrame:
    """APPLY a target token mixture as a deterministic per-source
    sample — the step after mixture_weights in a real pipeline:
    accounting (source_mixture) → weights (mixture_weights) → selection
    (this). Each source keeps rows at

        rate_s = min(1, base_rate · weight_s)

    via the same portable modular-hash Bernoulli as
    deterministic_sample, so the SAME rows are selected at every
    scale-out and in every engine. base_rate is the global down-scale
    (0.5 ≈ the target mixture at about half the corpus tokens);
    oversampling (weight_s > 1/base_rate) clips at keep-everything —
    single-epoch selection cannot repeat rows, a repetition factor is a
    different operator. A zero-token source (weight NULL) keeps
    nothing.

    The per-source rates are computed from the (eager, bounded)
    mixture_weights frame on the driver and ride the plan as ONE
    literal CASE chain over a codegen'd predicate: prunes at the scan,
    no shuffle, no join — the filter a 100 TB selection pass wants."""
    wrows = mixture_weights(docs, targets, text_col, source_col).collect()
    thresholds = {
        r[source_col]: int(prime * min(1.0, base_rate * r["weight"]))
        if r["weight"] is not None else 0
        for r in wrows
    }
    thr = F.lit(0)
    for src, t in sorted(thresholds.items()):
        thr = F.when(F.col(source_col) == src, F.lit(t)).otherwise(thr)
    h = (F.lit(mult) * F.col(id_col) + F.lit(offset)) % F.lit(prime)
    return docs.filter(h < thr)


def doc_fingerprint(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive document fingerprint:
        fp = Σ_i ((i+1)·h(tid_i) mod p)  mod p,  h(t) = (FP_MULT·t+12345) mod p
    over the dictionary-encoded token stream (ids in lexicographic term
    order via docid.dense_ids — no global window). Every per-position term
    is reduced mod p BEFORE the sum, so partials stay < p·dl and never wrap
    int64 (unbounded Σ (i+1)·h would wrap around dl ≈ 60k and diverge from
    the oracle's HUGEINT sum); (i+1) is reduced mod p too so the product is
    bounded by p² < 2^63. The DuckDB oracle computes the identical bounded
    expression."""
    pos = docs.select(
        F.col(id_col),
        F.posexplode(tokens_col(text_col)).alias("pos", "term"),
    )
    dic = dense_ids(pos.select("term").distinct(), "term", out_col="tid")
    h = (F.lit(FP_MULT) * F.col("tid") + F.lit(12345)) % F.lit(FP_PRIME)
    term = (((F.col("pos") + 1) % F.lit(FP_PRIME)) * h) % F.lit(FP_PRIME)
    return (
        pos.join(dic, "term")
        .groupBy(id_col)
        .agg((F.sum(term) % F.lit(FP_PRIME)).alias("fingerprint"))
    )
