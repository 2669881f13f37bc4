"""URL canonicalization for crawl-scale URL-level deduplication.

The first dedup every web pipeline runs (before any content hashing):
two fetches of the same page differ only in tracking query params,
fragments, host case, default ports, or a trailing slash — canonicalize
and group. Pure Catalyst regexp chain (JVM, codegen); every regex stays
in the common Java-regex/RE2 subset (no lookaround, no backreference
replacements) so the DuckDB oracle replays the identical patterns.

Rules, in order (each motivated by an equivalence RFC 3986 §6 allows):
  1. drop the fragment            (#... never reaches the server)
  2. drop tracking params         (utm_*, fbclid — content-neutral)
  3. mend separators              ('?&' -> '?', trailing '?'/'&' cut)
  4. lowercase scheme://host      (case-insensitive per RFC 3986 §3.2.2)
     and strip a ':443' default   (anchored on the authority, so a
     port on that prefix          ':443' inside path/query survives)
  5. strip the trailing path '/'  (also before '?': '/?q' -> '?q')

Scale shape: a projection — no shuffle, no Python; the dedup that
follows is one hash aggregate on the canonical string.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# authority prefix = scheme://host[:port] — everything before the first
# path/query/fragment delimiter
_AUTHORITY = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_TRACKING = r"(utm_[a-z]+|fbclid)=[^&#]*&?"


def canonicalize_url(url: Column | str) -> Column:
    """RFC-3986-equivalence canonical form of `url` (rules above)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")             # 1. fragment
    u = F.regexp_replace(u, _TRACKING, "")           # 2. tracking params
    u = F.regexp_replace(u, r"\?&", "?")             # 3. separators
    u = F.regexp_replace(u, r"[?&]$", "")
    prefix = F.regexp_replace(                        # 4. authority case
        F.lower(F.regexp_extract(u, _AUTHORITY, 0)),  # + default port
        r":443$", "",
    )
    rest = F.regexp_replace(u, _AUTHORITY, "")
    rest = F.regexp_replace(rest, r"/\?", "?")       # 5. trailing slash
    rest = F.regexp_replace(rest, r"/$", "")
    return F.concat(prefix, rest)


def canonicalize_url_sql(expr: str) -> str:
    """The identical rule chain as DuckDB SQL over `expr` — the oracle
    twin (DuckDB regexp_replace needs the explicit 'g' flag; group-0
    regexp_extract is the default)."""
    u = f"regexp_replace({expr}, '#.*$', '', 'g')"
    u = f"regexp_replace({u}, '{_TRACKING}', '', 'g')"
    u = f"regexp_replace({u}, '\\?&', '?', 'g')"
    u = f"regexp_replace({u}, '[?&]$', '', 'g')"
    prefix = (
        f"regexp_replace(lower(regexp_extract({u}, '{_AUTHORITY}')), "
        f"':443$', '')"
    )
    rest = f"regexp_replace({u}, '{_AUTHORITY}', '')"
    rest = f"regexp_replace({rest}, '/\\?', '?', 'g')"
    rest = f"regexp_replace({rest}, '/$', '')"
    return f"({prefix} || {rest})"
