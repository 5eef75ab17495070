"""URL canonicalization — the dedup key normalizer for web corpora.

Common-crawl-scale pipelines dedup and group by URL constantly; raw
URLs disagree on case, default ports, ``www.`` prefixes, tracking
params, param order, trailing slashes, and fragments. ``canonical``
folds all of those, producing the stable key used for exact URL dedup
and per-domain aggregation.

Pure Column expressions (regexp + array built-ins) — no UDF, so the
normalizer codegen's and pushes through whole-stage pipelines at
100 TB. The parameter filter/sort uses the array HOFs, which are
interpreted; they run over a handful of params per row (bounded work),
not over the corpus dimension.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, functions as F

# query params that never identify content
TRACKING_PREFIXES = ("utm_", "gclid", "fbclid", "msclkid")

_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"


def scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))


def host(url: Column) -> Column:
    """Lowercased host without port or a leading ``www.``."""
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    return F.regexp_replace(
        F.lower(F.regexp_extract(auth, r"^([^:]*)", 1)), r"^www\.", ""
    )


def port(url: Column) -> Column:
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    return F.regexp_extract(auth, r":([0-9]+)$", 1)


def path(url: Column) -> Column:
    """Path with trailing slashes trimmed; empty path becomes ``/``."""
    p = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"/+$", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def query_canonical(url: Column) -> Column:
    """Tracking params dropped, survivors sorted for order stability."""
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    def is_tracking(p: Column) -> Column:
        return reduce(
            lambda a, b: a | b,
            [p.startswith(pre) for pre in TRACKING_PREFIXES],
        )

    keep = F.filter(F.split(q, "&"), lambda p: (p != "") & ~is_tracking(p))
    return F.array_join(F.array_sort(keep), "&")


def canonical(url: Column) -> Column:
    """The full canonical form: lowercase scheme/host, no ``www.``,
    default ports dropped (80 for http, 443 for https), path trimmed,
    tracking params removed, remaining params sorted, fragment cut."""
    s = scheme(url)
    pt = port(url)
    default = (
        ((s == "http") & (pt == "80")) | ((s == "https") & (pt == "443"))
    )
    port_part = F.when(
        (pt == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), pt))
    q = query_canonical(url)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(s, F.lit("://"), host(url), port_part, path(url), q_part)
