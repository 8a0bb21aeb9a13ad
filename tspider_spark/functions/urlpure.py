"""Pure-Python URL semantics replicating the reference's URL value
object and JS-side helpers bit-for-bit (reference: core/utils/url.py,
core/spider/core.js). These functions are the single source of truth
wrapped by the vectorized pandas UDFs in ``urlfuncs.py`` and reused by
the sequential golden oracle in ``plans/oracle.py``.

Replicated quirks (required for exact crawl-order parity):

* ``normalize_url`` passes ``(scheme, netloc, path, query, params,
  fragment)`` to ``urlunparse`` — i.e. query and params are swapped
  versus the stdlib argument order ``(..., params, query, fragment)``
  (url.py:58-59). A protocol-relative ``//host/p?a=1#f`` therefore
  normalizes to ``http://host/p;a=1#f``.
* ``querydict`` drops blank-valued parse_qsl entries (url.py:106-108),
  so ``?0.61085`` contributes no query-key to the pattern.
* extension comes from an rfind split (url.py:92-98): no dot => ''.
* the per-host budget uses a strict ``>`` (redis_utils.py:188), so up
  to max_per_host+1 tasks per hostname are admitted — handled in the
  scheduler, recorded here for reference.
"""

from __future__ import annotations

import re
from typing import NamedTuple
from urllib.parse import parse_qsl, urljoin, urlparse

from tspider_spark.functions.psl import get_public_suffix

# F1 static-extension blocklist (url.py:17-25) — applied scheduler-side.
BLOCKEXT = frozenset(
    {
        "a3c", "ace", "aif", "aifc", "aiff", "arj", "asf", "asx", "attach", "au",
        "avi", "bin", "cab", "cache", "class", "djv", "djvu", "dwg", "es", "esl",
        "exe", "fif", "fvi", "gz", "hqx", "ice", "ief", "ifs", "iso", "jar", "kar",
        "mid", "midi", "mov", "movie", "mp", "mp2", "mp3", "mp4", "mpeg", "7z",
        "mpeg2", "mpg", "mpg2", "mpga", "msi", "pac", "pdf", "ppt", "pptx", "psd",
        "qt", "ra", "ram", "rm", "rpm", "snd", "svf", "tar", "tgz", "tif", "gzip",
        "tiff", "tpl", "uff", "wav", "wma", "wmv", "doc", "docx", "db", "jpg", "png",
        "bmp", "svg", "gif", "jpeg", "css", "js", "cur", "ico", "zip", "txt", "apk",
        "dmg", "xml", "torrent",
    }
)

# F3 hardcoded host blocklist (url.py:26).
BLOCKHOST = frozenset({"mirrors.aliyun.com", "code.taobao.org"})

# F2 — the *narrower* JS-side abort list (core.js:22-28, ends at jpg)
# and ad-host regex (core.js:19-21). NOTE: in the reference the abort
# fires *after* requestData was already pushed to requested_urls
# (casper_crawler.js:89-101), so F2 never filters emitted records; it
# only prevents sub-resource loads. Kept for corpus generation and
# documentation parity.
JS_BLOCKEXT = frozenset(
    {
        "a3c", "ace", "aif", "aifc", "aiff", "arj", "asf", "asx", "attach", "au",
        "avi", "bin", "cab", "cache", "class", "djv", "djvu", "dwg", "es", "esl",
        "exe", "fif", "fvi", "gz", "hqx", "ice", "ief", "ifs", "iso", "jar", "kar",
        "mid", "midi", "mov", "movie", "mp", "mp2", "mp3", "mp4", "mpeg",
        "mpeg2", "mpg", "mpg2", "mpga", "msi", "pac", "pdf", "ppt", "pptx", "psd",
        "qt", "ra", "ram", "rm", "rpm", "snd", "svf", "tar", "tgz", "tif",
        "tiff", "tpl", "uff", "wav", "wma", "wmv", "doc", "docx", "db", "jpg",
    }
)
AD_HOST_RE = re.compile(r"hm\.baidu\.com|googleads\.g\.doubleclick\.net")

# F6 void-js link list (core.js:103).
VOID_JSCODE = frozenset({"javascript:;", "javascript:void(0)", "javascript:void(0);"})

_DIGIT_RE = re.compile(r"\d+")

URL_FIELDS = [
    "valid", "url", "scheme", "netloc", "hostname", "domain", "path",
    "ext", "querystring", "pattern", "scan_key", "index_page",
    "blocked", "alicdn", "block_names",
]


class UrlInfo(NamedTuple):
    valid: bool
    url: str
    scheme: str
    netloc: str
    hostname: str
    domain: str
    path: str
    ext: str
    querystring: str
    pattern: str
    scan_key: str
    index_page: str
    blocked: bool
    alicdn: bool
    block_names: list  # F10 suffix-walk membership candidates


INVALID = UrlInfo(False, "", "", "", "", "", "", "", "", "", "", "", False, False, [])


def normalize_url(url: str) -> str:
    """T1 — url.py:37-60, including the urlunparse arg-order quirk."""
    if "/" not in url:
        return "http://{}".format(url)
    p = urlparse(url)
    if not p.netloc:
        if url.startswith("/"):
            return ""
        return "http://{}".format(url)
    if not p.scheme:
        # reference: urlunparse(('http', netloc, path or '/', QUERY,
        # PARAMS, fragment)) — query lands in the params slot and vice
        # versa (url.py:58-59). Reproduce the exact output.
        path = p.path or "/"
        out = "http://" + p.netloc + path
        if p.query:  # -> ';params' position
            out += ";" + p.query
        if p.params:  # -> '?query' position
            out += "?" + p.params
        if p.fragment:
            out += "#" + p.fragment
        return out
    return url


def parse_url(url: str) -> UrlInfo:
    """Full derived-field projection of the reference URL object."""
    # producer.py:70-72 drops empty urls before URL() is constructed
    if not url:
        return INVALID
    try:
        # schemeful http(s) URLs pass normalize_url untouched
        # (url.py:60) — skip its extra urlparse for the common case
        if url.startswith(("http://", "https://")):
            urlstring = url
        else:
            urlstring = normalize_url(url)
    except ValueError:
        return INVALID
    if not urlstring:
        return INVALID
    try:
        p = urlparse(urlstring)
        hostname = p.hostname or ""
    except ValueError:
        return INVALID
    path = p.path or "/"
    # filename / extension (url.py:83-98)
    filename = path[path.rfind("/") + 1 :]
    ext = filename[filename.rfind(".") + 1 :]
    if ext == filename:
        ext = ""
    domain = get_public_suffix(hostname)
    # pattern (url.py:118-134): digits -> {digit}; query keys sorted,
    # blank-valued entries dropped (parse_qsl default), joined by '<>'
    path_pattern = _DIGIT_RE.sub("{digit}", path)
    qkeys = sorted({k for k, _ in parse_qsl(p.query)}) if p.query else []
    pqs_pattern = (
        "{}?{}".format(path_pattern, "<>".join(qkeys)) if qkeys else path_pattern
    )
    # urlunsplit((scheme, netloc, pqs, '', '')) (url.py:123)
    pattern = "{}://{}{}".format(p.scheme, p.netloc, pqs_pattern)
    scan_key = "{}/{}".format(p.netloc, pqs_pattern)
    # urljoin(url, '/') for a netloc-bearing URL is scheme://netloc/
    # (url.py:114-116) — built directly, urljoin re-parses
    index_page = (
        "{}://{}/".format(p.scheme, p.netloc)
        if p.netloc
        else urljoin(urlstring, "/", allow_fragments=False)
    )
    blocked = ext.lower() in BLOCKEXT or hostname.lower() in BLOCKHOST
    alicdn = path.endswith("/") and p.query.startswith("?")
    return UrlInfo(
        valid=True,
        url=urlstring,
        scheme=p.scheme,
        netloc=p.netloc,
        hostname=hostname,
        domain=domain,
        path=path,
        ext=ext,
        querystring=p.query,
        pattern=pattern,
        scan_key=scan_key,
        index_page=index_page,
        blocked=blocked,
        alicdn=alicdn,
        block_names=block_names(hostname, domain),
    )


def block_names(hostname: str, domain: str) -> list:
    """F10 — every dns name whose blocklist membership blocks this host
    (redis_utils.py:198-216): the registered domain plus each suffix of
    the subdomain prefix walk (a.b.c.d.test.com -> a.b.c.d.test.com,
    b.c.d.test.com, c.d.test.com, d.test.com, test.com)."""
    if not hostname:
        return []
    names = [domain]
    if hostname == domain or not domain:
        return names
    prefix = hostname[: -(len(domain) + 1)]
    splits = prefix.split(".")
    for i in range(len(splits)):
        names.append("{}.{}".format(".".join(splits[i:]), domain))
    return names


# --- JS-side helpers (core.js) -------------------------------------------

_JS_SCHEMES = ("http://", "https://", "//")


def js_valid_scheme(url: str) -> bool:
    """core.js:115-123 — only http://, https://, // accepted."""
    return bool(url) and url.startswith(_JS_SCHEMES)


def js_normalize(url: str, page_scheme: str) -> str:
    """core.js:125-131 — resolve protocol-relative against the page's
    scheme, strip the fragment."""
    if not url:
        return ""
    if url.startswith("//"):
        url = page_scheme + ":" + url
    return url.split("#")[0]
