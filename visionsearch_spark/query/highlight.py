"""Snippet extraction + query-term highlighting for serving results.

The reference renders raw hit text client-side (`templates/index3.html`
shows the stored caption verbatim); a fulltext serving tier is expected
to return a query-focused snippet with the matched terms marked. This
module adds that on top of the in-memory searchers:

* :func:`highlight` — pure function: pick the best window of at most
  ``max_tokens`` consecutive tokens (most DISTINCT query terms, then
  most total matches, then earliest start — deterministic), return the
  original-text slice with every matched token wrapped in pre/post
  markers and ellipses where truncated.
* :func:`highlight_hits` — resolve hit texts from the store's staged
  table (docid-sorted parquet: a k-row ``docid IN`` filter prunes to
  O(k) row groups regardless of corpus size — the same point-lookup
  shape as the docmap path) and highlight each.

Token spans are found over ``text.lower()`` with the frozen analyzer's
token class ``[0-9a-z]+``, so what gets highlighted is exactly what
:func:`visionsearch_spark.analyzer.tokenize` would produce; when
lowercasing changes the string length (rare Unicode expansions) the
snippet is served from the lowered text rather than risking
misaligned offsets.
"""

from __future__ import annotations

import re

import pyarrow.dataset as pads

from visionsearch_spark.analyzer import tokenize
from visionsearch_spark.index.store import IndexStore

WORD_RE = re.compile(r"[0-9a-z]+")


def _best_window(hits_at: list[int], n_tokens: int, tok_terms: list[str],
                 max_tokens: int) -> tuple[int, int]:
    """[start, end) token-index window of width <= max_tokens maximizing
    (distinct matched terms, total matches, -start). Two-pointer O(n)."""
    if n_tokens <= max_tokens:
        return 0, n_tokens
    # no-match fallback = the leading full window; only a window with at
    # least one match (key strictly greater) replaces it
    best = (0, 0, 0)  # (distinct, total, -start)
    best_win = (0, max_tokens)
    counts: dict[str, int] = {}
    total = 0
    left = 0
    hit_set = set(hits_at)
    for right in range(n_tokens):
        if right in hit_set:
            t = tok_terms[right]
            counts[t] = counts.get(t, 0) + 1
            total += 1
        if right - left + 1 > max_tokens:
            if left in hit_set:
                t = tok_terms[left]
                counts[t] -= 1
                if not counts[t]:
                    del counts[t]
                total -= 1
            left += 1
        key = (len(counts), total, -left)
        if key > best:
            best = key
            best_win = (left, right + 1)
    # widen to the full budget for context (matches are unaffected:
    # the key already counted every hit the widened window adds on the
    # right edge only if some wider window had scored higher)
    lo, hi = best_win
    hi = min(n_tokens, max(hi, lo + max_tokens))
    lo = max(0, hi - max_tokens)
    return lo, hi


def highlight(text: str | None, query: str, max_tokens: int = 30,
              pre: str = "<em>", post: str = "</em>",
              ellipsis: str = "…") -> str:
    """Best-window snippet of ``text`` with query-term occurrences
    wrapped in pre/post. Empty text -> ''. A query with no match in the
    text still returns the leading window (standard fallback snippet)."""
    if not text:
        return ""
    qset = set(tokenize(query))
    low = text.lower()
    src = text if len(low) == len(text) else low
    spans = [(m.group(), m.start(), m.end()) for m in WORD_RE.finditer(low)]
    if not spans:
        return src if len(src) <= 4 * max_tokens else (
            src[: 4 * max_tokens] + ellipsis
        )
    tok_terms = [s[0] for s in spans]
    hits_at = [i for i, t in enumerate(tok_terms) if t in qset]
    lo, hi = _best_window(hits_at, len(spans), tok_terms, max_tokens)
    start = spans[lo][1] if lo > 0 else 0
    end = spans[hi - 1][2] if hi < len(spans) else len(src)
    out: list[str] = []
    if lo > 0:
        out.append(ellipsis)
    cur = start
    for i in range(lo, hi):
        t, s, e = spans[i]
        if t in qset:
            out.append(src[cur:s])
            out.append(pre + src[s:e] + post)
            cur = e
    out.append(src[cur:end])
    if hi < len(spans):
        out.append(ellipsis)
    return "".join(out)


def fetch_texts(store: IndexStore, docids: list[int]) -> dict[int, str]:
    """docid -> staged text for a SMALL docid set (top-k hits): pyarrow
    ``docid IN`` scan over the docid-sorted staged files — row-group
    stats prune to the O(k) groups actually holding the ids."""
    if not docids:
        return {}
    import pyarrow.compute as pc

    tbl = pads.dataset(store.staged_path).to_table(
        columns=["docid", "text"],
        filter=pc.field("docid").isin([int(d) for d in docids]),
    )
    return {
        int(d): str(t)
        for d, t in zip(tbl.column("docid").to_pylist(),
                        tbl.column("text").to_pylist())
    }


def highlight_hits(store: IndexStore, hits: list[tuple], query: str,
                   max_tokens: int = 30, pre: str = "<em>",
                   post: str = "</em>") -> list[tuple]:
    """Append a snippet column to searcher hits (last tuple element).
    Works on both LocalSearcher.search 4-tuples and search_docs
    3-tuples — element 0 must be the docid to resolve text for."""
    texts = fetch_texts(store, [int(h[0]) for h in hits])
    return [
        (*h, highlight(texts.get(int(h[0]), ""), query,
                       max_tokens=max_tokens, pre=pre, post=post))
        for h in hits
    ]
