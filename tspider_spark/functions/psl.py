"""Public-suffix resolution over the FULL Mozilla Public Suffix List
(reference: url.py:28,74-76 — `publicsuffix.PublicSuffixList
.get_public_suffix` over core/utils/public_suffix_list.dat).

The complete rule set (ICANN + PRIVATE sections, ~8.1k rules) is
bundled as ``psl_rules.txt`` (public data, MPL-2.0; regenerate with
tools/build_psl.py). Semantics are the standard PSL algorithm:

* a rule matches when its labels equal the hostname's rightmost
  labels; ``*.base`` matches any single extra label over ``base``;
* the prevailing rule is the matching exception rule if any
  (public suffix = exception minus its first label), else the longest
  match, else the implicit default rule ``*`` (the bare TLD);
* registered domain = public suffix plus one label.

Loaded once per process at import; executors each pay the ~100 KB read
once (the module ships with --py-files, like the reference ships the
dat file).
"""

from __future__ import annotations

EXACT: frozenset = frozenset()
WILDCARD_BASES: frozenset = frozenset()
EXCEPTIONS: frozenset = frozenset()
MAX_RULE_LABELS = 1


def _read_rules() -> str:
    # importlib.resources, not Path(__file__): the package deploys as a
    # spark-submit --py-files ZIP on executors, where __file__ points
    # inside the archive and plain open() fails
    from importlib.resources import files

    return files("tspider_spark.functions").joinpath("psl_rules.txt").read_text(
        encoding="utf-8"
    )


def _load():
    global EXACT, WILDCARD_BASES, EXCEPTIONS, MAX_RULE_LABELS
    exact, wild, exc = set(), set(), set()
    for line in _read_rules().splitlines():
        rule = line.strip()
        if not rule or rule.startswith("//"):
            continue
        if rule.startswith("!"):
            exc.add(rule[1:])
        elif rule.startswith("*."):
            wild.add(rule[2:])
        else:
            exact.add(rule)
    EXACT = frozenset(exact)
    WILDCARD_BASES = frozenset(wild)
    EXCEPTIONS = frozenset(exc)
    MAX_RULE_LABELS = max(
        max((r.count(".") + 1 for r in exact), default=1),
        max((b.count(".") + 2 for b in wild), default=1),
        max((r.count(".") + 1 for r in exc), default=1),
    )


_load()

# Kept for the JVM twin (functions/urlfuncs.py): multi-label exact
# rules grouped by label count. Single-label exact rules are omitted
# there on purpose — an exact 1-label match and the default rule both
# yield match_len == 1, so they cannot change the registered domain.
EXACT_BY_LEN: dict[int, tuple] = {}
WILD_BASES_BY_LEN: dict[int, tuple] = {}
EXC_BY_LEN: dict[int, tuple] = {}
for _r in EXACT:
    _k = _r.count(".") + 1
    if _k > 1:
        EXACT_BY_LEN.setdefault(_k, []).append(_r)
for _b in WILDCARD_BASES:
    WILD_BASES_BY_LEN.setdefault(_b.count(".") + 1, []).append(_b)
for _e in EXCEPTIONS:
    EXC_BY_LEN.setdefault(_e.count(".") + 1, []).append(_e)
EXACT_BY_LEN = {k: tuple(sorted(v)) for k, v in EXACT_BY_LEN.items()}
WILD_BASES_BY_LEN = {k: tuple(sorted(v)) for k, v in WILD_BASES_BY_LEN.items()}
EXC_BY_LEN = {k: tuple(sorted(v)) for k, v in EXC_BY_LEN.items()}


def get_public_suffix(hostname: str) -> str:
    """Registered domain for ``hostname`` (www.test.com -> test.com;
    a.b.github.io -> b.github.io; x.co.za -> x.co.za), matching
    publicsuffix.PublicSuffixList.get_public_suffix. Returns the
    hostname itself when it is (or is shorter than) a public suffix.

    Spec-exact rule precedence: a matching exception rule prevails over
    ALL other matches (publicsuffix.org algorithm step 4), else the
    longest match, else the implicit ``*`` rule (bare TLD).
    """
    if not hostname:
        return hostname
    labels = hostname.lower().strip(".").split(".")
    n = len(labels)
    best, exc_len = 1, 0
    for i in range(n):
        s = ".".join(labels[i:])
        if s in EXCEPTIONS:
            exc_len = n - i
        if s in EXACT and n - i > best:
            best = n - i
        if i + 1 < n and n - i > best and ".".join(labels[i + 1 :]) in WILDCARD_BASES:
            best = n - i
    match_len = exc_len - 1 if exc_len else best
    if n <= match_len:
        return ".".join(labels)
    return ".".join(labels[n - match_len - 1 :])


# ---------------------------------------------------------------------------
# grouped rule table for the JVM fast path (functions/urlfuncs.py)
#
# Embedding the ~6.6k multi-label rules as IN-list literals makes every
# URL-struct expression tree carry ~50k Catalyst nodes — plan
# optimization then dominates wave latency and OOMs the driver. Instead
# the JVM path resolves the suffix with ONE broadcast join against this
# table, keyed by the hostname's last two labels (every rule with >= 2
# labels shares its own last-2 labels with any hostname it can match),
# plus a 15-literal IN check for the single-label wildcard bases
# (``*.ck`` etc., whose matching hostnames have an unbounded set of
# last-2 keys).


def jvm_rule_rows() -> list:
    """Rows (key, m2, rules) for the broadcast lookup table:

    * ``key``   — the rule group's last-2 labels;
    * ``m2``    — True when ``key`` itself is an exact 2-label rule;
    * ``rules`` — [(lvl, wild, exc, s)] for every other multi-label
      rule in the group: exact rules with >= 3 labels (match when the
      hostname's last ``lvl`` labels == ``s``), wildcard bases with
      >= 2 labels (match level ``lvl`` = base labels + 1 when the last
      ``lvl - 1`` labels == ``s``), and exception rules (prevail; the
      registered domain then keeps ``lvl`` labels total).
    """
    groups: dict[str, dict] = {}

    def grp(key: str) -> dict:
        return groups.setdefault(key, {"m2": False, "rules": []})

    def last2(s: str) -> str:
        return ".".join(s.split(".")[-2:])

    for r in EXACT:
        k = r.count(".") + 1
        if k == 2:
            grp(r)["m2"] = True
        elif k >= 3:
            grp(last2(r))["rules"].append((k, False, False, r))
    for b in WILDCARD_BASES:
        bl = b.count(".") + 1
        if bl >= 2:  # single-label bases are handled by WILD1_BASES
            grp(last2(b))["rules"].append((bl + 1, True, False, b))
    for e in EXCEPTIONS:
        el = e.count(".") + 1
        grp(last2(e))["rules"].append((el, False, True, e))
    return [
        (k, v["m2"], sorted(v["rules"]) or None) for k, v in sorted(groups.items())
    ]


WILD1_BASES = tuple(sorted(b for b in WILDCARD_BASES if "." not in b))
