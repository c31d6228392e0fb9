"""String + datetime namespace tests (reference: expr/string.py,
functions/datetime.py surfaces)."""

import datetime as dt

import tabsdata_spark as td


def sel(tf, **named):
    return tf.select(**named).to_dict()


def test_string_case_length(spark):
    tf = td.TableFrame.from_dict(spark, {"s": ["Hello World", "héllo"]})
    d = sel(
        tf,
        up=td.col("s").str.to_uppercase(),
        lo=td.col("s").str.to_lowercase(),
        ti=td.col("s").str.to_titlecase(),
        lb=td.col("s").str.len_bytes(),
        lc=td.col("s").str.len_chars(),
    )
    assert d["up"][0] == "HELLO WORLD"
    assert d["lo"][1] == "héllo"
    assert d["ti"][0] == "Hello World"
    assert d["lb"][1] == 6 and d["lc"][1] == 5  # é is 2 bytes


def test_strip_family(spark):
    tf = td.TableFrame.from_dict(spark, {"s": ["  pad  ", "xxabcxx", "pre_body"]})
    d = sel(
        tf,
        t=td.col("s").str.strip_chars(),
        tc=td.col("s").str.strip_chars("x"),
        ts=td.col("s").str.strip_chars_start("x"),
        te=td.col("s").str.strip_chars_end("x"),
        sp=td.col("s").str.strip_prefix("pre_"),
        ss=td.col("s").str.strip_suffix("xx"),
    )
    assert d["t"][0] == "pad"
    assert d["tc"][1] == "abc"
    assert d["ts"][1] == "abcxx"
    assert d["te"][1] == "xxabc"
    assert d["sp"][2] == "body"
    assert d["ss"][1] == "xxabc"


def test_pad_zfill(spark):
    tf = td.TableFrame.from_dict(spark, {"s": ["7", "-7"]})
    d = sel(
        tf,
        ps=td.col("s").str.pad_start(3, "0"),
        pe=td.col("s").str.pad_end(3, "_"),
        z=td.col("s").str.zfill(4),
    )
    assert d["ps"][0] == "007"
    assert d["pe"][0] == "7__"
    assert d["z"] == ["0007", "-007"]


def test_search_extract(spark):
    tf = td.TableFrame.from_dict(spark, {"s": ["abc123def", "nope"]})
    d = sel(
        tf,
        c=td.col("s").str.contains(r"\d+"),
        cl=td.col("s").str.contains("123", literal=True),
        f=td.col("s").str.find("123", literal=True),
        sw=td.col("s").str.starts_with("abc"),
        ew=td.col("s").str.ends_with("def"),
        ex=td.col("s").str.extract(r"(\d+)", 1),
        cm=td.col("s").str.count_matches(r"[a-z]"),
        ca=td.col("s").str.contains_any(["123", "zzz"]),
    )
    assert d["c"] == [True, False]
    assert d["f"] == [3, None]
    assert d["ex"] == ["123", None]
    assert d["cm"] == [6, 4]
    assert d["ca"] == [True, False]


def test_replace_family(spark):
    tf = td.TableFrame.from_dict(spark, {"s": ["a.b.c"]})
    d = sel(
        tf,
        r1=td.col("s").str.replace(".", "-", literal=True),
        ra=td.col("s").str.replace_all(".", "-", literal=True),
        rm=td.col("s").str.replace_many({"a": "X", "c": "Z"}),
        rx=td.col("s").str.replace_all(r"[abc]", "#"),
    )
    assert d["r1"] == ["a-b.c"]
    assert d["ra"] == ["a-b-c"]
    assert d["rm"] == ["X.b.Z"]
    assert d["rx"] == ["#.#.#"]


def test_slice_head_tail_reverse(spark):
    tf = td.TableFrame.from_dict(spark, {"s": ["abcdefg"]})
    d = sel(
        tf,
        sl=td.col("s").str.slice(2, 3),
        sneg=td.col("s").str.slice(-3),
        h=td.col("s").str.head(2),
        t=td.col("s").str.tail(2),
        rv=td.col("s").str.reverse(),
    )
    assert d["sl"] == ["cde"]
    assert d["sneg"] == ["efg"]
    assert d["h"] == ["ab"] and d["t"] == ["fg"]
    assert d["rv"] == ["gfedcba"]


def test_to_integer_and_temporal_parse(spark):
    tf = td.TableFrame.from_dict(
        spark, {"i": ["42", "ff"], "d": ["2024-03-05", "2024-12-31"],
                "ts": ["2024-03-05 10:30:00", "2024-01-01 00:00:00"]}
    )
    d = sel(
        tf,
        i10=td.col("i").str.to_integer(strict=False),
        i16=td.col("i").str.to_integer(base=16),
        dd=td.col("d").str.to_date("%Y-%m-%d"),
        dts=td.col("ts").str.to_datetime("%Y-%m-%d %H:%M:%S"),
        tt=td.col("ts").str.to_time("%Y-%m-%d %H:%M:%S"),
    )
    assert d["i10"] == [42, None]
    assert d["i16"] == [66, 255]  # hex: 0x42=66, 0xff=255
    assert d["dd"][0] == dt.date(2024, 3, 5)
    assert d["dts"][0] == dt.datetime(2024, 3, 5, 10, 30)
    assert d["tt"][0] == 10 * 3600 + 30 * 60


def test_datetime_fields(spark):
    ts = dt.datetime(2024, 3, 5, 10, 30, 45, 123456)
    tf = td.TableFrame.from_dict(spark, {"t": [ts]})
    d = sel(
        tf,
        y=td.col("t").dt.year(), q=td.col("t").dt.quarter(),
        mo=td.col("t").dt.month(), dy=td.col("t").dt.day(),
        doy=td.col("t").dt.ordinal_day(), wk=td.col("t").dt.week(),
        wd=td.col("t").dt.weekday(), hr=td.col("t").dt.hour(),
        mi=td.col("t").dt.minute(), se=td.col("t").dt.second(),
        ms=td.col("t").dt.millisecond(), us=td.col("t").dt.microsecond(),
        leap=td.col("t").dt.is_leap_year(),
        iso=td.col("t").dt.iso_year(),
        mil=td.col("t").dt.millennium(), cen=td.col("t").dt.century(),
    )
    assert d["y"] == [2024] and d["q"] == [1] and d["mo"] == [3]
    assert d["dy"] == [5] and d["doy"] == [65]
    assert d["wd"] == [2]  # tuesday
    assert d["hr"] == [10] and d["mi"] == [30] and d["se"] == [45]
    assert d["ms"] == [123] and d["us"] == [123456]
    assert d["leap"] == [True]
    assert d["iso"] == [2024]
    assert d["mil"] == [3] and d["cen"] == [21]


def test_datetime_truncate_bounds_epoch(spark):
    ts = dt.datetime(2024, 3, 15, 10, 30, 45)
    tf = td.TableFrame.from_dict(spark, {"t": [ts]})
    d = sel(
        tf,
        tr=td.col("t").dt.truncate("1mo"),
        ms=td.col("t").dt.month_start(),
        me=td.col("t").dt.month_end(),
        ep=td.col("t").dt.epoch("s"),
        dte=td.col("t").dt.date(),
        fmt=td.col("t").dt.to_string("%Y/%m/%d %H:%M"),
    )
    assert d["tr"][0] == dt.datetime(2024, 3, 1)
    assert d["ms"][0] == dt.date(2024, 3, 1)
    assert d["me"][0] == dt.date(2024, 3, 31)
    assert d["ep"][0] == int(ts.replace(tzinfo=dt.timezone.utc).timestamp())
    assert d["dte"][0] == dt.date(2024, 3, 15)
    assert d["fmt"][0] == "2024/03/15 10:30"


def test_offset_by_and_business_days(spark):
    t0 = dt.datetime(2024, 1, 31, 12, 0, 0)
    tf = td.TableFrame.from_dict(spark, {"t": [t0]})
    d = sel(
        tf,
        mo=td.col("t").dt.offset_by("1mo"),
        dhm=td.col("t").dt.offset_by("2d3h"),
        neg=td.col("t").dt.offset_by("-1d"),
    )
    assert d["mo"][0] == dt.datetime(2024, 2, 29, 12, 0)
    assert d["dhm"][0] == dt.datetime(2024, 2, 2, 15, 0)
    assert d["neg"][0] == dt.datetime(2024, 1, 30, 12, 0)
    # business days: Fri 2024-03-01 + 1bd -> Mon 2024-03-04
    fri = dt.datetime(2024, 3, 1)
    tf2 = td.TableFrame.from_dict(spark, {"t": [fri]})
    d2 = sel(tf2, b=td.col("t").dt.add_business_days(1))
    assert d2["b"][0] == dt.date(2024, 3, 4)


def test_duration_totals(spark):
    a = dt.datetime(2024, 1, 1)
    b = dt.datetime(2024, 1, 3, 12, 0, 0)
    tf = td.TableFrame.from_dict(spark, {"a": [a], "b": [b]})
    dur = td.col("b") - td.col("a")
    d = sel(
        tf,
        dd=dur.dt.total_days(), hh=dur.dt.total_hours(),
        mm=dur.dt.total_minutes(), ss=dur.dt.total_seconds(),
    )
    assert d["dd"] == [2]
    assert d["hh"] == [60]
    assert d["mm"] == [3600]
    assert d["ss"] == [216000]


def test_quarter_unit(spark):
    ts = dt.datetime(2024, 8, 15, 10, 30)
    tf = td.TableFrame.from_dict(spark, {"t": [ts]})
    d = sel(
        tf,
        tq=td.col("t").dt.truncate("1q"),
        oq=td.col("t").dt.offset_by("1q"),
        oyq=td.col("t").dt.offset_by("1y1q"),
    )
    assert d["tq"][0] == dt.datetime(2024, 7, 1)
    assert d["oq"][0] == dt.datetime(2024, 11, 15, 10, 30)
    assert d["oyq"][0] == dt.datetime(2025, 11, 15, 10, 30)


# ---------------------------------------------------------------------------
# edge-contract regressions (round 7): Polars string/datetime parity on
# degenerate inputs (reference delegates to pl.Expr.str / pl.Expr.dt)
# ---------------------------------------------------------------------------

def test_pad_never_truncates(spark):
    """Polars pad_start/pad_end/zfill pad to AT LEAST length; Spark
    lpad/rpad truncate longer strings and must be guarded."""
    tf = td.TableFrame.from_dict(spark, {"s": ["hello", "-1234", "ab"]})
    d = sel(
        tf,
        ps=td.col("s").str.pad_start(3, "*"),
        pe=td.col("s").str.pad_end(3, "*"),
        zf=td.col("s").str.zfill(3),
    )
    assert d["ps"] == ["hello", "-1234", "*ab"]
    assert d["pe"] == ["hello", "-1234", "ab*"]
    assert d["zf"] == ["hello", "-1234", "0ab"]


def test_str_head_tail_negative(spark):
    """Polars: head(-n) strips the last n chars, tail(-n) the first n."""
    tf = td.TableFrame.from_dict(spark, {"s": ["hello", "ab", ""]})
    d = sel(tf, h=td.col("s").str.head(-2), t=td.col("s").str.tail(-2))
    assert d["h"] == ["hel", "", ""]
    assert d["t"] == ["llo", "", ""]


def test_find_returns_byte_offset(spark):
    """Polars find is the Rust BYTE index (str::find / Match::start):
    'héllo'.find('l') == 3 because é is two bytes."""
    tf = td.TableFrame.from_dict(spark, {"s": ["héllo", "naïve x", "no"]})
    d = sel(tf, lit=td.col("s").str.find("l", literal=True),
            rx=td.col("s").str.find("[lx]"))
    assert d["lit"] == [3, None, None]
    assert d["rx"] == [3, 7, None]


def test_to_integer_nondecimal_bases(spark):
    """F.conv silently parses invalid digits as 0 and reads '-' as unsigned
    two's complement; both are guarded now."""
    tf = td.TableFrame.from_dict(spark, {"h": ["ff", "-1A", "zz", ""]})
    d = sel(tf, v=td.col("h").str.to_integer(base=16, strict=False))
    assert d["v"] == [255, -26, None, None]
    ok = tf.filter(td.col("h").str.contains("^-?[0-9a-fA-F]+$"))
    assert sel(ok, v=td.col("h").str.to_integer(base=16, strict=True))["v"] \
        == [255, -26]
    import pytest
    with pytest.raises(Exception, match="to_integer"):
        sel(tf, v=td.col("h").str.to_integer(base=16, strict=True))


def test_subsecond_fields_nonnegative_pre_epoch(spark):
    """Time-of-day fractions are calendar values, never negative — pmod,
    not %, for pre-1970 instants."""
    ts = [dt.datetime(1969, 12, 31, 23, 59, 59, 500000),
          dt.datetime(2024, 2, 29, 0, 0, 0, 1)]
    tf = td.TableFrame.from_dict(spark, {"t": ts})
    d = sel(tf, ms=td.col("t").dt.millisecond(),
            us=td.col("t").dt.microsecond(),
            ns=td.col("t").dt.nanosecond())
    assert d["ms"] == [500, 0]
    assert d["us"] == [500000, 1]
    assert d["ns"] == [500000000, 1000]


def test_dt_replace_keeps_microseconds(spark):
    ts = dt.datetime(2023, 1, 31, 12, 30, 45, 123456)
    tf = td.TableFrame.from_dict(spark, {"t": [ts]})
    d = sel(tf, y=td.col("t").dt.replace(year=2000),
            m=td.col("t").dt.replace(microsecond=9),
            s=td.col("t").dt.replace(second=7))
    assert d["y"] == [ts.replace(year=2000)]
    assert d["m"] == [ts.replace(microsecond=9)]
    assert d["s"] == [ts.replace(second=7)]


def test_duration_totals_keep_subseconds(spark):
    """total_ms/us must not truncate to whole seconds; negative durations
    truncate toward zero (Rust i64 division semantics)."""
    a = [dt.datetime(2023, 1, 1, 0, 0, 1, 500000), dt.datetime(2023, 1, 1)]
    b = [dt.datetime(2023, 1, 1), dt.datetime(2023, 1, 1, 0, 0, 1, 500000)]
    tf = td.TableFrame.from_dict(spark, {"a": a, "b": b})
    diff = td.col("a") - td.col("b")
    d = sel(tf, s=diff.dt.total_seconds(), ms=diff.dt.total_milliseconds(),
            us=diff.dt.total_microseconds(), ns=diff.dt.total_nanoseconds())
    assert d["s"] == [1, -1]
    assert d["ms"] == [1500, -1500]
    assert d["us"] == [1500000, -1500000]
    assert d["ns"] == [1500000000, -1500000000]


def test_replace_capture_group_refs(spark):
    """Polars replacement values support rust-regex $N / ${N} group refs
    and $$ for a literal dollar."""
    tf = td.TableFrame.from_dict(spark, {"s": ["a-b-c"]})
    d = sel(tf,
            g=td.col("s").str.replace_all(r"(\w)", "<$1>"),
            dd=td.col("s").str.replace_all("-", "$$"),
            n1=td.col("s").str.replace(r"(\w)-", "[$1]"),
            lit=td.col("s").str.replace_all("-", "$1", literal=True))
    assert d["g"] == ["<a>-<b>-<c>"]
    assert d["dd"] == ["a$b$c"]
    assert d["n1"] == ["[a]b-c"]
    assert d["lit"] == ["a$1b$1c"]


def test_replace_lone_dollar_is_literal(spark):
    """r8 ADVICE regression: a '$' NOT followed by a group ref (space,
    punctuation, or end-of-string) must become a literal dollar in the
    Java replacement — Java regexp_replace throws INVALID_REGEXP_REPLACE
    on a bare '$'.  A '$name' whose name the pattern does NOT define
    expands to EMPTY, rust-regex's unknown-group rule (r9 ADVICE)."""
    tf = td.TableFrame.from_dict(spark, {"s": ["a-b-c"]})
    d = sel(tf,
            end=td.col("s").str.replace_all("-", "US$"),
            mid=td.col("s").str.replace("a", "$ x"),
            word=td.col("s").str.replace_all("-", "$x"),
            mix=td.col("s").str.replace_all(r"(\w)", "$1$"))
    assert d["end"] == ["aUS$bUS$c"]
    assert d["mid"] == ["$ x-b-c"]
    assert d["word"] == ["abc"]  # unknown group 'x' -> empty expansion
    assert d["mix"] == ["a$-b$-c$"]


def test_replace_unbraced_named_group_ref(spark):
    """r9 ADVICE regression: an unbraced $name ref to a group the pattern
    DEFINES must expand the named capture (rust-regex reads the longest
    [0-9A-Za-z_] run as the name; Java needs the braced ${name} form).
    Unknown names — including ones Java could never express, like a
    '_'-containing run that swallows trailing literal text — expand to
    empty, matching rust-regex."""
    tf = td.TableFrame.from_dict(spark, {"s": ["ab12cd", "x7y"]})
    d = sel(tf,
            nm=td.col("s").str.replace_all(r"(?<y>\d+)", "<$y>"),
            one=td.col("s").str.replace(r"(?<y>\d+)", "[$y]"),
            # '$y_z' parses as name 'y_z' (longest word run), which the
            # pattern does not define -> empty, 'swallowing' the _z text
            unk=td.col("s").str.replace_all(r"(?<y>\d+)", "$y_z!"),
            # braced ref to an unknown name -> empty as well
            bunk=td.col("s").str.replace_all(r"(?<y>\d+)", "${nope}!"))
    assert d["nm"] == ["ab<12>cd", "x<7>y"]
    assert d["one"] == ["ab[12]cd", "x[7]y"]
    assert d["unk"] == ["ab!cd", "x!y"]
    assert d["bunk"] == ["ab!cd", "x!y"]


def test_strip_end_before_final_newline(spark):
    """Fuzzer-found (r9, seed 20260901): Java's '$' anchor matches BEFORE
    a final line terminator, so strip_chars_end(' \\t-') on a string
    ending in '\\n' wrongly stripped the spaces before that newline, and
    to_integer's validity regex accepted '12\\n'.  Both anchors must be
    \\z (absolute end of input) — Python rstrip / rust str parsing never
    treat a trailing newline specially."""
    tf = td.TableFrame.from_dict(
        spark, {"s": [" \nYY  \n", "ab  ", "x \n\n"]})
    d = sel(tf, e=td.col("s").str.strip_chars_end(" \t-"),
            w=td.col("s").str.strip_chars())
    assert d["e"] == [" \nYY  \n", "ab", "x \n\n"]
    assert d["w"] == ["YY", "ab", "x"]
    tf2 = td.TableFrame.from_dict(spark, {"h": ["ff\n", "ff"]})
    got = sel(tf2, v=td.col("h").str.to_integer(base=16, strict=False))
    assert got["v"] == [None, 255]
    import pytest as _pytest

    with _pytest.raises(Exception, match="to_integer"):
        sel(tf2, v=td.col("h").str.to_integer(base=16, strict=True))


def test_titlecase_nonalpha_boundaries(spark):
    """Polars capitalizes after ANY non-alphabetic char, not just spaces."""
    tf = td.TableFrame.from_dict(
        spark, {"s": ["o'neil brown", "foo2bar", "A-B-C", ""]})
    assert sel(tf, v=td.col("s").str.to_titlecase())["v"] == \
        ["O'Neil Brown", "Foo2Bar", "A-B-C", ""]


def test_strip_chars_strips_all_whitespace(spark):
    """Default strip covers tabs/newlines (Python str.strip), not just
    spaces (Spark trim)."""
    tf = td.TableFrame.from_dict(spark, {"s": ["  x\ty\n", "\n\t", "a"]})
    d = sel(tf, v=td.col("s").str.strip_chars(),
            l=td.col("s").str.strip_chars_start(),
            r=td.col("s").str.strip_chars_end())
    assert d["v"] == ["x\ty", "", "a"]
    assert d["l"] == ["x\ty\n", "", "a"]
    assert d["r"] == ["  x\ty", "", "a"]


def test_rank_nulls_and_validation(spark):
    """Null values get a null rank and never shift non-null ranks;
    invalid method/closed arguments raise."""
    import pytest
    tf = td.TableFrame.from_dict(spark, {"a": [1.0, 2.0, None, 1.0]})
    got = sorted(sel(tf, v=td.col("a").rank("min"))["v"],
                 key=lambda x: (x is None, x))
    assert got == [1, 1, 3, None]
    avg = sorted(sel(tf, v=td.col("a").rank())["v"],
                 key=lambda x: (x is None, x))
    assert avg == [1.5, 1.5, 3.0, None]
    with pytest.raises(ValueError, match="rank"):
        sel(tf, v=td.col("a").rank(method="bogus"))
    with pytest.raises(ValueError, match="is_between"):
        sel(tf, v=td.col("a").is_between(0, 1, closed="bogus"))


def test_replace_brace_numeric_and_named_group_refs(spark):
    """rust-regex ${N} numeric brace refs must be rewritten to $N for Java
    (Java's ${...} form only allows letter-initial names and throws
    INVALID_REGEXP_REPLACE otherwise); ${name} letter-initial named refs
    pass through."""
    tf = td.TableFrame.from_dict(spark, {"s": ["a-b-c"]})
    d = sel(tf,
            br=td.col("s").str.replace_all(r"(\w)", "<${1}>"),
            brn=td.col("s").str.replace(r"(\w)-", "[${1}]"),
            nm=td.col("s").str.replace_all(r"(?<x>\w)", "<${x}>"))
    assert d["br"] == ["<a>-<b>-<c>"]
    assert d["brn"] == ["[a]b-c"]
    assert d["nm"] == ["<a>-<b>-<c>"]


def test_replace_escaped_dollar_not_shifted(spark):
    """An escaped literal $$1 must survive the n-bounded replace()'s
    prefix-group shift untouched (the shift used to run on the already
    escaped value and silently rewrote \\$1 -> \\$2)."""
    import pytest
    tf = td.TableFrame.from_dict(spark, {"s": ["a-b-c"]})
    d = sel(tf,
            one=td.col("s").str.replace("a", "$$1"),
            all_=td.col("s").str.replace_all("a", "$$1"))
    assert d["one"] == ["$1-b-c"]
    assert d["all_"] == ["$1-b-c"]
    # $0 (whole match) refs are unsupported on the n-bounded path only
    with pytest.raises(ValueError, match=r"\$0"):
        td.col("s").str.replace("a", "<$0>")
    with pytest.raises(ValueError, match=r"\$0"):
        td.col("s").str.replace("a", "<${0}>")
    assert sel(tf, v=td.col("s").str.replace_all(r"\w", "<$0>"))["v"] == \
        ["<a>-<b>-<c>"]


def test_dt_replace_rejects_unknown_kwargs(spark):
    """Polars raises for unsupported dt.replace arguments — a typo like
    microseconds= must not silently no-op."""
    import pytest
    tf = td.TableFrame.from_dict(
        spark, {"t": [dt.datetime(2023, 5, 6, 7, 8, 9)]})
    with pytest.raises(TypeError, match="microseconds"):
        sel(tf, v=td.col("t").dt.replace(microseconds=5))
    with pytest.raises(TypeError, match="nanosecond"):
        sel(tf, v=td.col("t").dt.replace(nanosecond=5))


def test_to_integer_validates_base(spark):
    """Polars requires base in 2..36; base=1/37 used to build a broken
    digit alphabet instead of raising."""
    import pytest
    tf = td.TableFrame.from_dict(spark, {"s": ["10"]})
    for bad in (0, 1, 37, -2):
        with pytest.raises(ValueError, match="base"):
            sel(tf, v=td.col("s").str.to_integer(base=bad))
    assert sel(tf, v=td.col("s").str.to_integer(base=2))["v"] == [2]
