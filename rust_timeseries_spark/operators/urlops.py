"""URL decomposition for web-corpus pipelines.

Provenance handling is a first-class step in every crawl-derived
training set: per-domain quotas, blocklists, dedup-by-URL and
domain-level quality priors all need (scheme, host, registered domain,
path depth) columns. Spark has ``parse_url``, but DuckDB (the oracle
engine) does not — so the decomposition is built from ``regexp_extract``
/ ``split`` primitives with IDENTICAL semantics on both engines, which
is also the right call at scale: every column below is a shuffle-free
codegen projection that runs at scan speed.

Semantics (deliberately simple and exactly specified, not a full
RFC 3986 parser):

* ``scheme``  — leading ``[a-z][a-z0-9+.-]*`` before ``://`` ('' if none)
* ``host``    — authority up to the first ``/``, with any ``:port``
  and ``user@`` stripped
* ``reg_domain`` — last two dot-labels of the host (``example.com``);
  the whole host when it has fewer than two labels. (Public-suffix-list
  awareness — ``co.uk`` — needs a lookup table; join one against
  ``reg_domain`` when available.)
* ``path``    — from the first ``/`` after the authority (query/fragment
  stripped); ``path_depth`` = number of non-empty segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([a-z][a-z0-9+.-]*)://"


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    u = F.col(url_col)
    scheme = F.regexp_extract(u, _SCHEME_RE, 1)
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    authority = F.split(rest, "/").getItem(0)
    no_user = F.element_at(F.split(authority, "@"), -1)
    host = F.split(no_user, ":").getItem(0)
    labels = F.split(host, r"\.")
    nlab = F.size(labels)
    reg_domain = F.when(
        nlab >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(host)
    # path: strip authority, then query/fragment; '' when no '/' follows
    path_full = F.regexp_replace(rest, r"^[^/]*", "")
    path = F.split(F.split(path_full, r"\?").getItem(0), "#").getItem(0)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != F.lit("")))
    return (
        df.withColumn("scheme", scheme)
        .withColumn("host", host)
        .withColumn("reg_domain", reg_domain)
        .withColumn("path", path)
        .withColumn("path_depth", depth.cast("long"))
    )
