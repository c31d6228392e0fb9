"""Property tests: the version grammar + resolver vs a pure list-slice
model (reference client/td-sdk/tabsdata/_tableuri.py:13,79,151 grammar and
td-execution/src/version_resolver.rs:31-180 semantics).

The model is deliberately naive: a history is a Python list (oldest ->
newest); HEAD~n is history[-1-n], INITIAL~n is history[n], a list maps
element-wise, a range is an inclusive ascending slice, and everything that
falls off either end (or descends) is an error.  resolve_refs must agree
with the model on every randomly generated (history, ref) pair, and every
parseable ref must round-trip through str().
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tabsdata_spark.errors import VersionResolutionError
from tabsdata_spark.store.versions import (
    TableURI,
    Version,
    VersionList,
    VersionRange,
    parse_versions,
    resolve_refs,
)

# -- generators -------------------------------------------------------------

_ID_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"


def _ids(n: int) -> list[str]:
    # deterministic distinct 26-char ids: V<index> padded with the alphabet
    return [f"V{i:04d}".ljust(26, "X") for i in range(n)]


histories = st.integers(min_value=1, max_value=40).map(_ids)

# offsets beyond any generated history length probe the out-of-range path
head_refs = st.integers(min_value=0, max_value=50).flatmap(
    lambda n: st.sampled_from(
        ["HEAD" + "^" * n, f"HEAD~{n}"] if n <= 6 else [f"HEAD~{n}"]))
initial_refs = st.integers(min_value=0, max_value=50).map(
    lambda n: "INITIAL" if n == 0 else f"INITIAL~{n}")
fixed_refs = st.integers(min_value=0, max_value=45).map(
    lambda i: _ids(i + 1)[i])
single_refs = st.one_of(head_refs, initial_refs, fixed_refs)


# -- the model --------------------------------------------------------------


def model_one(history: list[str], text: str) -> str:
    if text.startswith("HEAD"):
        rest = text[4:]
        n = len(rest) if rest.startswith("^") or rest == "" else int(rest[1:])
        idx = len(history) - 1 - n
    elif text.startswith("INITIAL"):
        rest = text[7:]
        n = len(rest) if rest.startswith("^") or rest == "" else int(rest[1:])
        idx = n
    else:
        if text not in history:
            raise VersionResolutionError("unknown")
        return text
    if idx < 0 or idx >= len(history):
        raise VersionResolutionError("out of range")
    return history[idx]


def model_resolve(history: list[str], text: str) -> list[str]:
    if not history:
        raise VersionResolutionError("no versions")
    if ".." in text:
        a, b = text.split("..", 1)
        ia = history.index(model_one(history, a))
        ib = history.index(model_one(history, b))
        if ia > ib:
            raise VersionResolutionError("descending")
        return history[ia:ib + 1]
    if "," in text:
        return [model_one(history, p) for p in text.split(",")]
    return [model_one(history, text)]


# -- properties -------------------------------------------------------------


@settings(max_examples=400, deadline=None)
@given(histories, single_refs)
def test_single_ref_matches_model(history, text):
    try:
        want = model_resolve(history, text)
    except VersionResolutionError:
        with pytest.raises(VersionResolutionError):
            resolve_refs(history, parse_versions(text))
        return
    assert resolve_refs(history, parse_versions(text)) == want


@settings(max_examples=400, deadline=None)
@given(histories, st.lists(single_refs, min_size=2, max_size=5))
def test_list_ref_matches_model(history, parts):
    text = ",".join(parts)
    try:
        want = model_resolve(history, text)
    except VersionResolutionError:
        with pytest.raises(VersionResolutionError):
            resolve_refs(history, parse_versions(text))
        return
    got = resolve_refs(history, parse_versions(text))
    assert got == want


@settings(max_examples=600, deadline=None)
@given(histories, single_refs, single_refs)
def test_range_matches_model(history, a, b):
    text = f"{a}..{b}"
    try:
        want = model_resolve(history, text)
    except VersionResolutionError:
        with pytest.raises(VersionResolutionError):
            resolve_refs(history, parse_versions(text))
        return
    got = resolve_refs(history, parse_versions(text))
    assert got == want
    # a range is always a contiguous ascending slice of the history
    idxs = [history.index(v) for v in got]
    assert idxs == list(range(idxs[0], idxs[-1] + 1))


@settings(max_examples=300, deadline=None)
@given(single_refs)
def test_ref_roundtrips_through_str(text):
    v = Version.parse(text)
    # canonical spelling parses back to the same offsets/id
    assert Version.parse(str(v)) == v
    # carets and ~n are the same offset spelling
    if text.startswith("HEAD") and "~" not in text:
        assert v.head_offset == text.count("^")


@settings(max_examples=300, deadline=None)
@given(histories, st.lists(single_refs, min_size=1, max_size=4),
       st.booleans())
def test_uri_versions_resolve_like_bare_refs(history, parts, with_coll):
    """collection/table@refs resolves exactly like the bare ref string."""
    text = ",".join(parts) if len(parts) > 1 else parts[0]
    uri = TableURI.parse(("c/t@" if with_coll else "t@") + text)
    assert (uri.collection, uri.table) == (("c" if with_coll else None), "t")
    try:
        want = model_resolve(history, text)
    except VersionResolutionError:
        with pytest.raises(VersionResolutionError):
            resolve_refs(history, uri.versions)
        return
    assert resolve_refs(history, uri.versions) == want
    # and the URI round-trips through str
    assert TableURI.parse(str(uri)) == uri


@settings(max_examples=200, deadline=None)
@given(st.text(
    alphabet="HEADINTL~^0123456789abz@/.,$ -", min_size=1, max_size=12))
def test_garbage_never_misparses(text):
    """Arbitrary junk either parses to a ref that str-roundtrips, or
    raises VersionResolutionError — never a stray builtin exception."""
    try:
        ref = parse_versions(text)
    except VersionResolutionError:
        return
    if isinstance(ref, Version):
        assert Version.parse(str(ref)) == ref
    elif isinstance(ref, VersionList):
        assert parse_versions(",".join(str(v) for v in ref.versions)) == ref
    elif isinstance(ref, VersionRange):
        assert parse_versions(f"{ref.start}..{ref.end}") == ref


def test_empty_history_always_errors():
    for text in ("HEAD", "INITIAL", "HEAD~3", "HEAD..HEAD"):
        with pytest.raises(VersionResolutionError, match="no committed"):
            resolve_refs([], parse_versions(text))
