"""URL canonicalization for crawl-scale URL-level deduplication.

The first dedup every web pipeline runs (before any content hashing):
two fetches of the same page differ only in tracking query params,
fragments, host case, default ports, or a trailing slash — canonicalize
and group. Pure Catalyst regexp chain (JVM, codegen); every regex stays
in the common Java-regex/RE2 subset — no lookaround and no
backreference REPLACEMENTS (Spark spells them $1, DuckDB \\1; staying
literal keeps the two chains mechanically identical).

Rules, in order (each motivated by an equivalence RFC 3986 §6 allows):
  0. strip surrounding whitespace — not only hygiene: Java regex lets a
     bare '$' match BEFORE a trailing newline while RE2 ('$' = end of
     text) does not, so every later $-anchored rule would diverge
     between the Spark chain and its DuckDB twin on a '\\n'-terminated
     URL; with the ends stripped the anchors agree (interior newlines
     never match '.'/'[^...]' classes in either engine)
  1. drop the fragment            (#... never reaches the server)
  2. drop tracking params         (utm_*, fbclid — content-neutral),
     anchored at a [?&] boundary  (a param NAMED xutm_a, or a VALUE
     so legit names/values that    containing 'utm_x=', is untouched)
     merely contain 'utm_' survive
  3. mend separators              ('&&..' -> '&', '?&' -> '?',
                                   trailing '?'/'&' cut)
  4. lowercase scheme://authority (scheme+host are case-insensitive per
     and strip the DEFAULT port    RFC 3986 §3.2.2; ':443' only under
     anchored on the authority     https, ':80' only under http — the
                                   same port is NON-default elsewhere.
     Simplification: a userinfo@ part, if present, is lowercased with
     the host; credentialed URLs are out of scope for crawl dedup)
  5. strip the trailing slash of the PATH only ('/p/' -> '/p',
     '/?q' -> '?q') — '/' inside query values is legal and survives

Scale shape: a projection — no shuffle, no Python; the dedup that
follows is one hash aggregate on the canonical string.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# authority prefix = scheme://host[:port] — everything before the first
# path/query/fragment delimiter
_AUTHORITY = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_TRACK = "(utm_[a-z]+|fbclid)=[^&#]*"
_WS_ENDS = r"^\s+|\s+$"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of `url` under the equivalence rules above."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, _WS_ENDS, "")             # 0. whitespace
    u = F.regexp_replace(u, r"#.*$", "")              # 1. fragment
    u = F.regexp_replace(u, rf"\?{_TRACK}", "?")      # 2. tracking at ?
    u = F.regexp_replace(u, rf"&{_TRACK}", "&")       #    tracking at &
    u = F.regexp_replace(u, r"&&+", "&")              # 3. separators
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]$", "")
    prefix = F.lower(F.regexp_extract(u, _AUTHORITY, 0))
    prefix = F.when(                                   # 4. default port,
        prefix.startswith("https://"),                 #    per scheme
        F.regexp_replace(prefix, r":443$", ""),
    ).when(
        prefix.startswith("http://"),
        F.regexp_replace(prefix, r":80$", ""),
    ).otherwise(prefix)
    rest = F.regexp_replace(u, _AUTHORITY, "")
    path = F.regexp_replace(                           # 5. path slash
        F.regexp_extract(rest, r"^[^?]*", 0), r"/$", ""
    )
    query = F.regexp_replace(rest, r"^[^?]*", "")
    return F.concat(prefix, path, query)


def canonical_clean_sql(expr: str) -> str:
    """Stages 0-3 (whitespace, fragment, tracking, separators) as DuckDB
    SQL over `expr` — regexes character-identical to the Spark chain
    (DuckDB regexp_replace needs the explicit 'g' flag). Bind the result
    ONCE (a CTE column) and feed it to `canonical_compose_sql`: the
    compose step references its input several times, and inlining this
    6-stage chain at each mention multiplies the generated SQL."""
    u = f"regexp_replace({expr}, '{_WS_ENDS}', '', 'g')"
    u = f"regexp_replace({u}, '#.*$', '', 'g')"
    u = f"regexp_replace({u}, '\\?{_TRACK}', '?', 'g')"
    u = f"regexp_replace({u}, '&{_TRACK}', '&', 'g')"
    u = f"regexp_replace({u}, '&&+', '&', 'g')"
    u = f"regexp_replace({u}, '\\?&', '?', 'g')"
    return f"regexp_replace({u}, '[?&]$', '', 'g')"


def canonical_compose_sql(expr: str) -> str:
    """Stages 4-5 (authority case + default port, path-only trailing
    slash) over an already-cleaned `expr` (ideally a plain column)."""
    lowered = f"lower(regexp_extract({expr}, '{_AUTHORITY}'))"
    prefix = (
        f"CASE WHEN starts_with({lowered}, 'https://')"
        f" THEN regexp_replace({lowered}, ':443$', '')"
        f" WHEN starts_with({lowered}, 'http://')"
        f" THEN regexp_replace({lowered}, ':80$', '')"
        f" ELSE {lowered} END"
    )
    rest = f"regexp_replace({expr}, '{_AUTHORITY}', '')"
    path = f"regexp_replace(regexp_extract({rest}, '^[^?]*'), '/$', '')"
    query = f"regexp_replace({rest}, '^[^?]*', '')"
    return f"({prefix} || {path} || {query})"


def canonicalize_url_sql(expr: str) -> str:
    """The full rule chain as one DuckDB expression — prefer the
    clean/compose split with a CTE binding in between for real oracles
    (see canonical_clean_sql)."""
    return canonical_compose_sql(canonical_clean_sql(expr))
