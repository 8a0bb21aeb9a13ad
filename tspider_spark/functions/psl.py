"""Minimal public-suffix resolution (reference: url.py:28,74-76).

The reference resolves a hostname to its registered domain with the
``publicsuffix`` package over Mozilla's full public_suffix_list.dat.
That package is not available offline, so this module implements the
same lookup algorithm over an embedded subset of the public suffix
list that covers every TLD the synthetic corpora use plus the common
global ones. For production, swap ``SUFFIXES`` for the full list (the
algorithm is the standard longest-match PSL rule; registered domain =
longest matching public suffix plus one label).
"""

from __future__ import annotations

# Subset of the Mozilla Public Suffix List (public data). Longest
# match wins; unknown TLDs fall back to the single last label, which
# mirrors the PSL default "*" rule.
SUFFIXES = frozenset(
    {
        "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
        "io", "ai", "dev", "app", "xyz", "top", "site", "online", "me",
        "co", "tv", "cc", "us", "eu", "de", "fr", "it", "nl", "es",
        "ru", "jp", "kr", "in", "br", "au", "ca", "ch", "se", "no",
        "cn", "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
        "uk", "co.uk", "org.uk", "gov.uk", "ac.uk", "net.uk",
        "co.jp", "ne.jp", "or.jp", "ac.jp",
        "com.au", "net.au", "org.au",
        "com.br", "net.br", "org.br",
        "co.kr", "or.kr", "co.in", "net.in",
    }
)


def get_public_suffix(hostname: str) -> str:
    """Registered domain for ``hostname`` (e.g. www.test.com -> test.com).

    Matches publicsuffix.PublicSuffixList.get_public_suffix semantics
    for hostnames covered by the embedded list: returns the public
    suffix plus one label, or the hostname itself when it already is a
    (or shorter than any) public suffix.
    """
    if not hostname:
        return hostname
    labels = hostname.lower().strip(".").split(".")
    n = len(labels)
    # longest matching suffix: scan from the longest candidate down
    match_len = 1  # default rule: unknown TLD == 1 label
    for i in range(n):
        if ".".join(labels[i:]) in SUFFIXES:
            match_len = n - i
            break
    if n <= match_len:
        return ".".join(labels)
    return ".".join(labels[n - match_len - 1 :])
