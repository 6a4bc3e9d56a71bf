"""Property fuzz for the query-string parser: any input either parses
into well-formed clause sets or raises the documented ValueError —
never a different exception, never malformed output (an interactive
surface must not 500 on garbage)."""

from __future__ import annotations

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from visionsearch_spark.query.querylang import parse_query

TOKEN = re.compile(r"^[0-9a-z]+$")

# printable junk + the grammar's own metacharacters, weighted so quotes
# and signs actually occur
alphabet = st.sampled_from(
    list(string.ascii_letters + string.digits) +
    list(' +-"*?~^.,:;()[]{}\\/') * 2
)
query_strings = st.text(alphabet=alphabet, min_size=0, max_size=80)


@settings(max_examples=500, deadline=None)
@given(query_strings)
def test_parser_total_and_well_formed(q):
    try:
        p = parse_query(q)
    except ValueError:
        return  # the documented signed-expansion / signed-phrase reject
    for t in p.must + p.must_not + p.should + list(p.boosts):
        assert TOKEN.match(t), (q, t)
    for pre in p.prefixes:
        assert TOKEN.match(pre), (q, pre)
    for pat in p.wildcards:
        assert re.match(r"^[0-9a-z*?]+$", pat) and (
            "*" in pat or "?" in pat), (q, pat)
    for t, e in p.fuzzies:
        assert TOKEN.match(t) and 0 <= e <= 9, (q, t, e)
    for b in p.boosts.values():
        assert b >= 0.0
    for ph, slop in p.phrases:
        assert len(set(ph.split())) >= 1 and slop >= 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(
    ["join", "+join", "-dup", '"table scan"', "fil*", "fuzz~1",
     "stream^2", "w?ld", "café", '"table scan"~2']), min_size=0, max_size=8))
def test_parser_stable_on_clause_soup(parts):
    q = " ".join(parts)
    p = parse_query(q)  # grammar-only input never raises
    # idempotent clause counting: re-parsing the same string is identical
    p2 = parse_query(q)
    assert (p.must, p.must_not, sorted(p.should), p.phrases,
            p.prefixes, p.wildcards, p.fuzzies, p.boosts) == \
        (p2.must, p2.must_not, sorted(p2.should), p2.phrases,
         p2.prefixes, p2.wildcards, p2.fuzzies, p2.boosts)
