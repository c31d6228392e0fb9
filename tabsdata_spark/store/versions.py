"""Version refs and table URIs.

Parity with reference client/td-sdk/tabsdata/_tableuri.py (Version /
VersionList / VersionRange / TableURI classes, regex at _tableuri.py:27) and
the server-side resolver semantics (td-execution/src/version_resolver.rs:
31-180): relative refs resolve against the committed-version history
"as of" a trigger timestamp.

Grammar:
    HEAD | HEAD^ | HEAD^^ ... | HEAD~n | INITIAL | INITIAL~n | <26-char id>
    list:  ref,ref,...
    range: ref..ref
    uri:   [collection/]table[@versions]
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..errors import VersionResolutionError

# reference VERSION_PATTERN (_tableuri.py:26): any 26 uppercase
# alphanumerics — the store generates crockford ids, but the PARSER must
# accept every id the reference grammar accepts
FIXED_ID_RE = re.compile(r"^[A-Z0-9]{26}$")
HEAD_RE = re.compile(r"^HEAD(\^*)$|^HEAD~(\d+)$")
INITIAL_RE = re.compile(r"^INITIAL(\^*)$|^INITIAL~(\d+)$")


@dataclass(frozen=True)
class Version:
    """A single version ref: fixed id, or offset from HEAD/INITIAL."""

    fixed: str | None = None
    head_offset: int | None = None     # HEAD~n (0 == HEAD)
    initial_offset: int | None = None  # INITIAL~n (0 == INITIAL)

    @staticmethod
    def parse(text: str) -> "Version":
        text = text.strip()
        m = HEAD_RE.match(text)
        if m:
            if m.group(2) is not None:
                return Version(head_offset=int(m.group(2)))
            return Version(head_offset=len(m.group(1) or ""))
        m = INITIAL_RE.match(text)
        if m:
            # INITIAL^^ mirrors HEAD^^: carets are an offset spelling
            # (reference VERSION_PATTERN, _tableuri.py:HEAD\^*|INITIAL\^*)
            if m.group(2) is not None:
                return Version(initial_offset=int(m.group(2)))
            return Version(initial_offset=len(m.group(1) or ""))
        if FIXED_ID_RE.match(text):
            return Version(fixed=text)
        raise VersionResolutionError(f"bad version ref: {text!r}")

    def __str__(self) -> str:
        if self.fixed:
            return self.fixed
        if self.head_offset is not None:
            return "HEAD" if self.head_offset == 0 else f"HEAD~{self.head_offset}"
        return "INITIAL" if self.initial_offset == 0 else f"INITIAL~{self.initial_offset}"


@dataclass(frozen=True)
class VersionList:
    versions: tuple[Version, ...]

    @staticmethod
    def parse(text: str) -> "VersionList":
        return VersionList(tuple(Version.parse(p) for p in text.split(",")))


@dataclass(frozen=True)
class VersionRange:
    start: Version
    end: Version

    @staticmethod
    def parse(text: str) -> "VersionRange":
        a, b = text.split("..", 1)
        return VersionRange(Version.parse(a), Version.parse(b))


def parse_versions(text: str):
    """Dispatch ref / list / range."""
    if ".." in text:
        return VersionRange.parse(text)
    if "," in text:
        return VersionList.parse(text)
    return Version.parse(text)


@dataclass(frozen=True)
class TableURI:
    """collection/table@versions (reference _tableuri.py:264)."""

    collection: str | None
    table: str
    versions: object | None  # Version | VersionList | VersionRange | None

    @staticmethod
    def parse(text: str) -> "TableURI":
        # strict reference grammar (_tableuri.py build_table_uri_object):
        # ^([^/@]+/)?([^/@]+)(@versions)?$ — multi-slash collections and
        # empty segments are rejected, not silently re-split
        vpart = None
        if "@" in text:
            text, vtext = text.split("@", 1)
            vpart = parse_versions(vtext)
        if "/" in text:
            coll, table = text.split("/", 1)
        else:
            coll, table = None, text
        if not table or "/" in table or "@" in table or coll == "":
            raise VersionResolutionError(f"bad table uri: {text!r}")
        return TableURI(coll or None, table, vpart)

    def __str__(self) -> str:
        s = f"{self.collection}/{self.table}" if self.collection else self.table
        if self.versions is not None:
            if isinstance(self.versions, VersionList):
                s += "@" + ",".join(str(v) for v in self.versions.versions)
            elif isinstance(self.versions, VersionRange):
                s += f"@{self.versions.start}..{self.versions.end}"
            else:
                s += f"@{self.versions}"
        return s


def resolve_refs(history: list[str], ref) -> list[str]:
    """Resolve a parsed ref against an ordered (oldest->newest) list of
    committed version ids (reference version_resolver.rs semantics)."""
    if not history:
        raise VersionResolutionError("table has no committed versions")

    def one(v: Version) -> str:
        if v.fixed is not None:
            if v.fixed not in history:
                raise VersionResolutionError(f"unknown version id {v.fixed}")
            return v.fixed
        if v.head_offset is not None:
            idx = len(history) - 1 - v.head_offset
        else:
            idx = v.initial_offset or 0
        if idx < 0 or idx >= len(history):
            raise VersionResolutionError(f"version ref {v} out of range "
                                         f"({len(history)} versions)")
        return history[idx]

    if isinstance(ref, Version):
        return [one(ref)]
    if isinstance(ref, VersionList):
        return [one(v) for v in ref.versions]
    if isinstance(ref, VersionRange):
        a, b = one(ref.start), one(ref.end)
        ia, ib = history.index(a), history.index(b)
        if ia > ib:
            # reference contract (version_resolver.rs InvalidRange): "in a
            # range, the left version must be older than the right
            # version" — a descending range is an error, never a silent
            # swap returning data the user didn't ask for
            raise VersionResolutionError(
                f"range start {ref.start} is newer than end {ref.end}")
        return history[ia:ib + 1]
    raise VersionResolutionError(f"bad ref object {ref!r}")
