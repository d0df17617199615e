"""robots.txt parsing and path matching, reference-parity semantics.

From-scratch line-based reimplementation of the behavior defined by:

- the flex grammar:        /root/reference/src/crawler/robots.ll:31-139
  (case-insensitive directive keywords at line start, inline ``#`` comments,
  HTML-garbage bailout via an SGML-tag regex while still in START state)
- the group state machine: /root/reference/src/crawler/Robots.cc:70-93
  (consecutive ``User-agent`` lines aggregate into one group; a group closes
  when a rule line is followed by a new ``User-agent`` line; EOF flushes)
- entry states:            /root/reference/src/crawler/Robots.hh:32-37
  (EMPTY / PRESENT / NOT_AVAILABLE / EPARSE) and the ``tried_but_failed ⇒
  allowed`` rule used by the crawler (crawler.cc:1037-1049)
- path matching:           the documented matching table at
  /root/reference/src/crawler/Robots.hh:70-93 — first-match-wins PREFIX rule
  with %-escape canonicalization such that ``%7E`` ≡ ``~`` and ``%3c`` ≡
  ``%3C`` but ``%2F`` ≢ ``/``.

Deviation note: Robots.cc:56 compares ``rule.compare(0, rule.size(), path)``
which is full-string equality in C++ (an apparent bug — it contradicts the
documented table directly above it at Robots.hh:73-75). We implement the
documented prefix semantics, which is also what the crawler's own doc
(norobots-rfc) specifies. Likewise the rule/path canonicalization in the
code (``unescape_not(escape(p, PATH), PATH)``) would decode ``%2F`` to ``/``
contradicting Robots.hh:86-88; we canonicalize with ``normalize_escapes``
semantics (unescape-safe + uppercase remaining escapes), which reproduces
the documented table exactly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum

from .urlcanon import P, escape, normalize_escapes_str


class RobotsState(Enum):
    EMPTY = 0
    PRESENT = 1
    NOT_AVAILABLE = 2
    EPARSE = 3


DISALLOW = 0
ALLOW = 1
CRAWL_DELAY = 2

_SGML_TAG = re.compile(r"<[^>]+>")
# directive at line start, case-insensitive (flex %option case-insensitive)
_UA_RE = re.compile(r"user-agent:[ \t]*([^#\r\n]+)([ \t]*#.*)?", re.IGNORECASE)
_ALLOW_RE = re.compile(r"allow:[ \t]*([^#\r\n]*)([ \t]*#.*)?", re.IGNORECASE)
_DISALLOW_RE = re.compile(r"disallow:[ \t]*([^#\r\n]*)([ \t]*#.*)?", re.IGNORECASE)
_DELAY_RE = re.compile(r"crawl-delay:[ \t]*([^#\r\n]*)([ \t]*#.*)?", re.IGNORECASE)
# sitemaps.org: Sitemap lines are GROUP-INDEPENDENT (may appear anywhere
# in the file and apply to all agents), so parsing one must not disturb
# the UA-group state machine
_SITEMAP_RE = re.compile(r"sitemap:[ \t]*([^#\r\n]*)([ \t]*#.*)?",
                         re.IGNORECASE)
_COMMENT_RE = re.compile(r"[ \t]*#.*")
_BLANK_RE = re.compile(r"[ \t]*")
# chars for which canon_rule_path is the identity (in the path class, no
# escapes): anything else routes that path to the per-path slow path
_PATH_UNSAFE_RE = re.compile(r"[^A-Za-z0-9/._~-]")


def canon_rule_path(p: str) -> str:
    """Canonicalize a rule/request path for matching.

    Escapes path-unsafe chars, unescapes safe escapes, uppercases the rest —
    reproducing the equivalences of the Robots.hh:70-93 table
    (``%7E``≡``~``, ``%3c``≡``%3C``, ``%2F``≢``/``).
    """
    return normalize_escapes_str(escape(p, P))


@dataclass
class UasRules:
    """One 'User-agent:'-group and its rules (Robots.hh:146-155)."""
    ua: list[str] = field(default_factory=list)
    rules: list[tuple[int, str]] = field(default_factory=list)  # (type, text)

    def empty(self) -> bool:
        return not self.ua


# parser states (Robots.hh:128-134)
_START, _READING_UAS, _RULES = 0, 1, 2


class Robots:
    """Parsed robots.txt (reference class Robots)."""

    def __init__(self, text: str | None = None):
        self.valid = False
        self.errors: list[str] = []
        self.groups: list[UasRules] = []
        self.sitemaps: list[str] = []
        self._state = _START
        self._current = UasRules()
        if text is not None:
            self.parse(text)

    def clear(self) -> None:
        self.valid = False
        self.groups = []
        self.sitemaps: list[str] = []
        self._current = UasRules()
        self._state = _START

    # -- state changers (Robots.cc:70-93) --
    def _reading_uas(self) -> None:
        if self._state == _RULES:
            self.groups.append(self._current)
            self._current = UasRules()
            self.valid = True
        self._state = _READING_UAS

    def _rules(self) -> None:
        self._state = _RULES

    def _eof(self) -> None:
        if not self._current.empty():
            self.groups.append(self._current)
            self._current = UasRules()
            self.valid = True

    def parse(self, text: str) -> int:
        """Parse robots.txt content; returns 0 on success, -1 when the body
        looks like HTML while nothing was parsed yet (robots.ll:115-131)."""
        for raw in re.split(r"\r\n|\n|\r", text):
            if not raw:
                continue
            if _COMMENT_RE.fullmatch(raw) or _BLANK_RE.fullmatch(raw):
                continue
            m = _UA_RE.fullmatch(raw) or _UA_RE.fullmatch(raw.rstrip())
            if m and m.group(1).strip():
                self._reading_uas()
                self._current.ua.append(m.group(1).split('#')[0].strip())
                continue
            m = _ALLOW_RE.fullmatch(raw.rstrip())
            if m:
                self._rules()
                rule = canon_rule_path(m.group(1).split('#')[0].strip())
                self._current.rules.append((ALLOW, rule))
                continue
            m = _DISALLOW_RE.fullmatch(raw.rstrip())
            if m:
                self._rules()
                rule = canon_rule_path(m.group(1).split('#')[0].strip())
                self._current.rules.append((DISALLOW, rule))
                continue
            m = _DELAY_RE.fullmatch(raw.rstrip())
            if m:
                self._rules()
                self._current.rules.append((CRAWL_DELAY, m.group(1).split('#')[0].strip()))
                continue
            m = _SITEMAP_RE.fullmatch(raw.rstrip())
            if m:
                url = m.group(1).split('#')[0].strip()
                if url:
                    self.sitemaps.append(url)
                continue  # group-independent: state untouched
            # unmatched line
            self.errors.append(f"unmatched: |{raw}|")
            if self._state == _START and _SGML_TAG.search(raw):
                return -1
        self._eof()
        self._state = _START
        return 0

    def path_allowed(self, user_agent: str, path: str) -> bool:
        """First matching group for the UA decides; within it, the first
        rule whose text is a prefix of the canonicalized path decides
        (ALLOW→True, DISALLOW→False); no match ⇒ allowed.

        Structure follows Robots::path_allowed (Robots.cc:47-68): only the
        first group naming this UA (or ``*``) is consulted.
        """
        cpath = canon_rule_path(path)
        for group in self.groups:
            for ua in group.ua:
                if ua == user_agent or ua == "*":
                    for rtype, rtext in group.rules:
                        if rtype == CRAWL_DELAY:
                            continue
                        if rtext and cpath.startswith(rtext):
                            return rtype == ALLOW
                    return True
        return True

    def path_allowed_many(self, user_agent: str, paths) -> "np.ndarray":
        """Vectorized ``path_allowed`` over a path array (same semantics:
        first UA-matching group, first prefix-matching rule wins, no match
        ⇒ allowed). The UA group is resolved ONCE; rule matching is
        pandas ``str.startswith`` per rule over the whole column; only
        paths containing %-escapes or path-unsafe characters take the
        per-path canonicalization slow path (identity otherwise)."""
        import numpy as np
        import pandas as pd
        s = pd.Series(paths, dtype="str").reset_index(drop=True)
        allowed = np.ones(len(s), dtype=bool)
        group = None
        for g in self.groups:
            if any(ua == user_agent or ua == "*" for ua in g.ua):
                group = g
                break
        if group is None:
            return allowed
        unsafe = s.str.contains(_PATH_UNSAFE_RE).to_numpy()
        canon = s.copy()
        if unsafe.any():
            canon[unsafe] = [canon_rule_path(p) for p in s[unsafe]]
        undecided = np.ones(len(s), dtype=bool)
        for rtype, rtext in group.rules:
            if rtype == CRAWL_DELAY or not rtext:
                continue
            if not undecided.any():
                break
            m = undecided & canon.str.startswith(rtext).to_numpy()
            allowed[m] = rtype == ALLOW
            undecided &= ~m
        return allowed

    def crawl_delay(self, user_agent: str) -> float | None:
        """Crawl-delay for a UA (parsed but unused by the reference,
        Robots.hh:48 todo; we honor it in the politeness stage)."""
        for group in self.groups:
            for ua in group.ua:
                if ua == user_agent or ua == "*":
                    for rtype, rtext in group.rules:
                        if rtype == CRAWL_DELAY:
                            try:
                                return float(rtext)
                            except ValueError:
                                return None
                    return None
        return None


class RobotsEntry(Robots):
    """Robots + fetch-state (reference Robots_entry, Robots.hh:173-195)."""

    def __init__(self, text: str | None = None,
                 state: RobotsState = RobotsState.EMPTY):
        if text is not None:
            super().__init__(None)
            res = self.parse(text)
            if res < 0:
                self.clear()
                self.state = RobotsState.EPARSE
            else:
                self.state = RobotsState.PRESENT
        else:
            super().__init__(None)
            self.state = state

    def tried_but_failed(self) -> bool:
        return self.state in (RobotsState.NOT_AVAILABLE, RobotsState.EPARSE)

    def allowed(self, user_agent: str, path: str) -> bool:
        """Crawler-level decision (crawler.cc:1037-1049): missing or
        unparseable robots ⇒ allowed; PRESENT ⇒ path_allowed."""
        if self.tried_but_failed():
            return True
        if self.state == RobotsState.PRESENT:
            return self.path_allowed(user_agent, path)
        return True

    def to_record(self) -> dict:
        """Serializable form for the robots_cache checkpoint table."""
        return {
            "state": self.state.name,
            "groups": [
                {"ua": g.ua, "rules": [[t, s] for t, s in g.rules]}
                for g in self.groups
            ],
        }

    @classmethod
    def from_record(cls, rec: dict) -> "RobotsEntry":
        e = cls(state=RobotsState[rec["state"]])
        for g in rec.get("groups", []):
            e.groups.append(UasRules(list(g["ua"]), [tuple(r) for r in g["rules"]]))
        if e.groups:
            e.valid = True
        return e


# --------------------------------------------------------------------------
# RFC 9309 matching (opt-in, beside the reference-parity prefix matcher)
# --------------------------------------------------------------------------
from functools import lru_cache


@lru_cache(maxsize=4096)
def _rfc9309_rule_re(rtext: str):
    """Rule pattern → compiled regex per RFC 9309 §2.2.3: ``*`` matches
    any octet sequence, a TRAILING ``$`` anchors the end; everything
    else is literal. Prefix semantics otherwise (match from the path
    start, no implicit end anchor)."""
    anchored = rtext.endswith("$")
    body = rtext[:-1] if anchored else rtext
    pattern = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile(pattern + ("$" if anchored else ""))


class Rfc9309Mixin:
    """``path_allowed_rfc9309`` for Robots: modern REP semantics —
    most-specific UA group set (exact product token beats ``*``, all
    matching groups MERGE per §2.2.1), longest-matching rule wins,
    Allow wins ties (§2.2.2). The reference's matcher (first group,
    first prefix rule) stays the parity default; this is the opt-in the
    wider web needs (wildcard rules are ubiquitous in real robots.txt)."""

    def path_allowed_rfc9309(self, user_agent: str, path: str) -> bool:
        cpath = canon_rule_path(path)
        exact = [g for g in self.groups
                 if any(ua == user_agent for ua in g.ua)]
        groups = exact or [g for g in self.groups
                           if any(ua == "*" for ua in g.ua)]
        best: tuple[int, bool] | None = None
        for g in groups:
            for rtype, rtext in g.rules:
                if rtype == CRAWL_DELAY or not rtext:
                    continue
                if _rfc9309_rule_re(rtext).match(cpath):
                    key = (len(rtext), rtype == ALLOW)
                    if best is None or key > best:
                        best = key
        return True if best is None else best[1]


# graft the mixin onto the parsed-robots classes (parse layer shared;
# only the matching discipline differs)
Robots.path_allowed_rfc9309 = Rfc9309Mixin.path_allowed_rfc9309
