"""Property test: substitute_params vs a naive character-scan model.

Pinned contract (reference client/td-sdk/tabsdata/_io/inputs/
sql_inputs.py:779-787 plus the two documented hardenings from r8):
single pass, a `:token` is replaced only when the FULL \\w+ run after the
colon is a key (so `:id` can never corrupt `:id2`), unknown tokens pass
through verbatim (`::int` casts, `'12:30'` literals), and None inlines
as SQL NULL.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tabsdata_spark.io.sql_io import substitute_params


def model(query: str, values: dict) -> str:
    out, i = [], 0
    while i < len(query):
        ch = query[i]
        if ch == ":":
            j = i + 1
            while j < len(query) and (query[j].isalnum() or query[j] == "_"):
                j += 1
            token = query[i + 1:j]
            if token and token in values:
                v = values[token]
                out.append("NULL" if v is None else str(v))
                i = j
                continue
        out.append(ch)
        i += 1
    return "".join(out)


chunks = st.sampled_from([
    "SELECT * FROM t WHERE ", "x", " ", "'12:30'", "::int", "::text",
    "id > ", "name = ", ":", "(", ")", ",", "a_b", "0", "--", "' :id '",
])
keys = st.sampled_from(["id", "id2", "number", "a", "a1", "ts", "_x"])
refs = keys.map(lambda k: f":{k}")
query_strategy = st.lists(st.one_of(chunks, refs), min_size=0,
                          max_size=12).map("".join)
value_strategy = st.dictionaries(
    keys,
    st.one_of(st.integers(-1000, 1000), st.none(),
              st.sampled_from(["'v'", "2024-01-01", "abc"])),
    max_size=5)


@settings(max_examples=500, deadline=None)
@given(query_strategy, value_strategy)
def test_substitute_params_matches_model(query, values):
    assert substitute_params(query, values) == model(query, values)


def test_substitute_params_pinned_examples():
    # the reference's own example shape
    assert substitute_params("where id > :number", {"number": 2}) == \
        "where id > 2"
    # unknown tokens pass through: casts and time literals survive
    q = "SELECT x::int FROM t WHERE ts > '12:30' AND id > :id"
    assert substitute_params(q, {"id": 7}) == \
        "SELECT x::int FROM t WHERE ts > '12:30' AND id > 7"
    # prefix keys never corrupt longer placeholders
    assert substitute_params(":id :id2", {"id": 1, "id2": 22}) == "1 22"
    assert substitute_params(":id2", {"id": 1}) == ":id2"
    # None -> SQL NULL (documented deviation from the reference's str())
    assert substitute_params("v = :v", {"v": None}) == "v = NULL"
    # raw str() inlining, no quoting
    assert substitute_params("n = :n", {"n": "abc"}) == "n = abc"
