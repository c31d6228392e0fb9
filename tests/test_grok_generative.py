"""Generative round-trip fuzz of the grok compiler: build log lines FROM
known component values, then assert TableFrame.grok parses every value
back (reference grok engine functions.rs:14-61; our compiler expands
%{SYNTAX:name:type} to one JVM regex).  Token generators are chosen so a
space-joined line is unambiguous for the composed pattern; typed captures
(:int/:float) round-trip through the cast path.
"""

from __future__ import annotations

import random

import pytest

import tabsdata_spark as td


def _gen_int(rng):
    v = rng.randint(-9999, 9999)
    return str(v), v


def _gen_posint(rng):
    v = rng.randint(1, 99999)
    return str(v), v


def _gen_number(rng):
    if rng.random() < 0.5:
        v = rng.randint(-999, 999)
        return str(v), float(v)
    v = round(rng.uniform(-99, 99), 3)
    return f"{v:.3f}", float(f"{v:.3f}")


def _gen_word(rng):
    s = "".join(rng.choice("abcXYZ_09") for _ in range(rng.randint(1, 8)))
    return s, s


def _gen_notspace(rng):
    s = "".join(rng.choice("a/b=:#1.-") for _ in range(rng.randint(1, 10)))
    return s, s


def _gen_ipv4(rng):
    s = ".".join(str(rng.randint(0, 255)) for _ in range(4))
    return s, s


def _gen_uuid(rng):
    h = "".join(rng.choice("0123456789abcdef") for _ in range(32))
    s = f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"
    return s, s


def _gen_time(rng):
    s = f"{rng.randint(0, 23)}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
    return s, s


def _gen_greedy(rng):
    s = " ".join(_gen_word(rng)[0] for _ in range(rng.randint(1, 3)))
    return s, s


# kind -> (grok syntax, type suffix or None, generator)
TOKENS = {
    "int": ("INT", "int", _gen_int),
    "posint": ("POSINT", "int", _gen_posint),
    "num": ("NUMBER", "float", _gen_number),
    "word": ("WORD", None, _gen_word),
    "ns": ("NOTSPACE", None, _gen_notspace),
    "ip": ("IPV4", None, _gen_ipv4),
    "uuid": ("UUID", None, _gen_uuid),
    "time": ("TIME", None, _gen_time),
}
SEPS = [" ", " - ", " [", "] ", " | "]


@pytest.mark.parametrize("seed", [20260908])
def test_grok_roundtrips_generated_lines(spark, seed):
    from _concurrency import run_concurrent

    # phase 1: generate all programs sequentially on the seeded rng
    # (bit-identical stream); phase 2 executes them concurrently —
    # independent tiny Spark jobs, guide §2.6
    rng = random.Random(seed)
    programs = []
    for p in range(120):
        nt = rng.randint(1, 5)
        kinds = [rng.choice(sorted(TOKENS)) for _ in range(nt)]
        greedy_tail = rng.random() < 0.3
        parts, pattern_parts, expected = [], [], {}
        for j, kind in enumerate(kinds):
            syntax, typ, gen = TOKENS[kind]
            text, val = gen(rng)
            name = f"f{j}"
            pattern_parts.append(
                f"%{{{syntax}:{name}:{typ}}}" if typ
                else f"%{{{syntax}:{name}}}")
            parts.append(text)
            expected[name] = val
            if j < nt - 1:
                sep = rng.choice(SEPS)
                # bracket separators must pair up or the regex chars leak;
                # keep it simple: escape nothing, use only safe seps
                sep = sep.replace("[", "(").replace("]", ")")
                pattern_parts.append(sep.replace("(", r"\(")
                                     .replace(")", r"\)")
                                     .replace("|", r"\|"))
                parts.append(sep)
        if greedy_tail:
            text, val = _gen_greedy(rng)
            pattern_parts.append(r" %{GREEDYDATA:rest}")
            parts.append(" " + text)
            expected["rest"] = val
        line = "".join(parts)
        pattern = "".join(pattern_parts)
        programs.append((p, line, pattern, expected, greedy_tail))

    def run_one(prog):
        p, line, pattern, expected, greedy_tail = prog
        tf = td.TableFrame.from_spark(
            spark.createDataFrame([(line,)], "line string"))
        got = tf.grok("line", pattern).to_dict()
        for name, val in expected.items():
            assert got[name] == [val], (
                f"seed={seed} p={p}\nline={line!r}\npattern={pattern!r}\n"
                f"field {name}: got {got[name]!r} want {[val]!r}")
        # a non-matching line nulls every capture: a spaces-only line is
        # unmatchable by every token kind above — but GREEDYDATA (.*)
        # matches anything, so skip when the pattern ends with it
        if not greedy_tail:
            bad = tf.with_columns(line=td.lit("   ")) \
                .grok("line", pattern).to_dict()
            assert all(bad[name] == [None] for name in expected), \
                (pattern, bad)

    run_concurrent(programs, run_one)
