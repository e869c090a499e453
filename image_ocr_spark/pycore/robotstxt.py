"""robots.txt — the RFC 9309 Robots Exclusion Protocol, from scratch.

The site-level companion to the page-level meta gate (robots.py): a
Common-Crawl-style pipeline must not retain URLs the origin disallowed
for its crawler.  The reference has no crawl concept; this is a
beyond-reference curation operator in the WARC/link-graph family.

Parsing (RFC 9309 §2.2, deterministic and hostile-input-safe):
- lines are `field: value` with optional whitespace; `#` starts a
  comment; unknown fields and malformed lines are ignored;
- `user-agent` lines start/extend a group (consecutive agent lines share
  one group); `allow`/`disallow` lines attach rules to the current
  group; rules before any user-agent line are ignored;
- an empty `disallow:` value is a no-op rule (allows everything) and is
  dropped at parse time;
- field names and agent tokens compare case-insensitively; rule paths
  compare case-SENSITIVELY (they are octets).

Group selection (§2.2.1): the crawler picks the group whose user-agent
token is the LONGEST one contained in (prefix-matching, per the
product-token convention) its own name; `*` matches any crawler but only
applies when no named group matches.  Multiple groups with the same
token merge.

Rule matching (§2.2.2): a rule pattern matches path prefixes, with `*`
matching any octet sequence and a trailing `$` anchoring the end.  The
applied rule is the MOST SPECIFIC match — longest pattern in octets —
and on equal length `allow` wins.  No rule matching = allowed.

The Spark twin (operators/robotsfrontier.py) parses per host via this
module once (hosts << urls) and evaluates per URL with pure JVM column
expressions: each pattern is compiled here to a SQL LIKE pattern (`*`→
`%`, `$`→anchored, literal `%`/`_`/`\\` escaped) so the per-URL pass is
scan-stage whole-stage-codegen, no Python anywhere near the URL table —
and the same LIKE strings make the check replayable in DuckDB.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

Rule = Tuple[bool, str]  # (is_allow, pattern)

_LINE_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")


def parse_robots_txt(text: str) -> Dict[str, List[Rule]]:
    """agent-token (lowercased) -> ordered rule list.  Groups repeating a
    token merge; `*` is a token like any other here (selection handles
    its fallback role)."""
    groups: Dict[str, List[Rule]] = {}
    current: List[str] = []
    saw_rule = True  # a user-agent line after rules STARTS a new group
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0]
        m = _LINE_RE.match(line)
        if not m:
            continue
        field, value = m.group(1).lower(), m.group(2)
        if field == "user-agent":
            if saw_rule:
                current = []
                saw_rule = False
            token = value.strip().lower()
            if token:
                current.append(token)
                groups.setdefault(token, [])
        elif field in ("allow", "disallow"):
            saw_rule = True
            if not current:
                continue  # rules before any user-agent line
            if field == "disallow" and value == "":
                continue  # empty disallow allows everything: no-op
            if value == "":
                continue  # empty allow is equally vacuous
            for token in current:
                groups[token].append((field == "allow", value))
        # other fields (sitemap, crawl-delay, unknown) neither attach to
        # the group nor break user-agent accumulation (the documented
        # behavior of Google's reference parser for non-group records)
    return groups


def select_group(groups: Dict[str, List[Rule]], agent: str) -> List[Rule]:
    """RFC 9309 §2.2.1: longest agent token that prefixes the crawler's
    (lowercased) product token; `*` only as fallback."""
    a = agent.strip().lower()
    best, best_len = None, -1
    for token, rules in groups.items():
        if token != "*" and a.startswith(token) and len(token) > best_len:
            best, best_len = rules, len(token)
    if best is not None:
        return best
    return groups.get("*", [])


def _match(pattern: str, path: str) -> bool:
    """`*` wildcard + optional trailing `$` anchor over octets — the same
    language as the compiled LIKE pattern (to_like).  Leftmost-lazy
    middle parts are optimal (each earliest match leaves maximal room for
    the suffix), so no backtracking is needed."""
    anchored = pattern.endswith("$")
    pat = pattern[:-1] if anchored else pattern
    parts = pat.split("*")
    if not path.startswith(parts[0]):
        return False
    if len(parts) == 1:  # no wildcard: plain prefix, or exact if anchored
        return path == pat if anchored else True
    pos = len(parts[0])
    for part in parts[1:-1]:
        if part:
            idx = path.find(part, pos)
            if idx < 0:
                return False
            pos = idx + len(part)
    last = parts[-1]
    if last == "":  # pattern ends with '*': any tail, anchored or not
        return True
    if anchored:
        return path.endswith(last) and len(path) - len(last) >= pos
    return path.find(last, pos) >= 0


def allowed(rules: List[Rule], path: str) -> bool:
    """Most-specific (longest-pattern) match; allow wins equal lengths;
    no match = allowed."""
    best_len, best_allow = -1, True
    for is_allow, pattern in rules:
        if _match(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and is_allow):
                best_len, best_allow = plen, is_allow
    return best_allow


def to_like(pattern: str) -> str:
    """Compile a rule pattern to the SQL LIKE string the Spark/DuckDB
    evaluation uses (escape char `\\`): `*` -> `%`, trailing `$` anchors
    (no trailing `%`), prefix semantics otherwise (trailing `%`)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = []
    # Track whether the LAST emitted token is an UNESCAPED '%' (i.e. came
    # from '*').  A literal '%' compiles to '\%' and a literal '\' before
    # '*' compiles to '\\%' (escaped backslash + live wildcard), so a
    # textual endswith('%') test over-matches; the flag is exact.
    last_is_wild = False
    for ch in body:
        if ch == "*":
            out.append("%")
            last_is_wild = True
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
            last_is_wild = False
        else:
            out.append(ch)
            last_is_wild = False
    like = "".join(out)
    if not anchored and not last_is_wild:
        like += "%"
    return like


def parse_robots_extras(text: str) -> Tuple[List[str], Dict[str, int]]:
    """(sitemaps, crawl_delay_milli_by_agent): the non-rule records a
    frontier scheduler consumes.  Sitemap lines are global (RFC 9309
    treats them as non-group records); crawl-delay (de-facto extension)
    attaches to the current user-agent group(s), later lines win,
    non-numeric values are ignored, and the value is quantized to
    integer milliseconds (the house integer-units rule)."""
    sitemaps: List[str] = []
    delays: Dict[str, int] = {}
    current: List[str] = []
    saw_rule = True
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0]
        m = _LINE_RE.match(line)
        if not m:
            continue
        field, value = m.group(1).lower(), m.group(2)
        if field == "user-agent":
            if saw_rule:
                current = []
                saw_rule = False
            token = value.strip().lower()
            if token:
                current.append(token)
        elif field in ("allow", "disallow"):
            saw_rule = True
        elif field == "sitemap":
            if value:
                sitemaps.append(value)
        elif field == "crawl-delay":
            try:
                seconds = float(value)
            except ValueError:
                continue
            # NaN fails the >= 0 test; inf / 400-digit values CLAMP to a
            # day (a delay beyond that means "don't crawl"; unclamped,
            # int(round(inf*1000)) raised OverflowError out of the
            # never-raise parser — found by self-probe r06)
            if seconds >= 0:
                seconds = min(seconds, 86_400.0)
                for token in current:
                    delays[token] = int(round(seconds * 1000))
    return sitemaps, delays


def select_crawl_delay(delays: Dict[str, int], agent: str) -> int:
    """Longest-agent-token selection (same rule as select_group);
    0 = no delay declared for this crawler."""
    a = agent.strip().lower()
    best, best_len = None, -1
    for token, d in delays.items():
        if token != "*" and a.startswith(token) and len(token) > best_len:
            best, best_len = d, len(token)
    if best is not None:
        return best
    return delays.get("*", 0)
