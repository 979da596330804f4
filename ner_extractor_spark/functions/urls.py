"""URL canonicalization (web-corpus hygiene: the per-url identity the
north rule's byte-parity and dedup contracts key on).

``canonical_url`` normalizes the parts of a URL that vary without
changing the resource — entirely with JVM-side built-ins (regexp +
array HOFs), so it is engine-portable and the DuckDB oracle replays it
verbatim:

  1. strip the fragment (``#...``);
  2. lowercase the scheme and authority (never the path/query);
  3. drop default ports (``http://h:80``, ``https://h:443``);
  4. strip trailing path slashes from the base (the part before the
     FIRST ``?`` — anything after it is query data, never rewritten);
  5. drop ``utm_*`` tracking params, sort the rest byte-wise, drop the
     ``?`` if nothing survives.

This is deliberately conservative: no percent-decoding, no case change
outside scheme/authority, no param-value rewriting — those can change
the resource on real servers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_SCHEME_AUTH = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"


def canonical_url(col):
    # 1. fragment
    u = F.regexp_replace(col, r"#.*$", "")
    # 2. lowercase scheme://authority, keep the rest byte-identical
    head = F.regexp_extract(u, _SCHEME_AUTH, 1)
    tail = F.regexp_replace(u, _SCHEME_AUTH, "")
    u = F.concat(F.lower(head), tail)
    # 3. default ports (group 2 optional: bare "http://h:80" also strips)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?].*)?$", r"$1$2")
    # 4+5. split at the FIRST '?' — everything after it is query DATA
    #    (a '/?' or trailing '/' inside a param value is never path
    #    syntax; rewriting it would break the module's
    #    no-param-value-rewriting conservatism — ADVICE r03).  Trailing
    #    path slashes are stripped from the BASE only; query params
    #    drop utm_*, byte-sort the rest, and the '?' disappears when
    #    nothing survives.  Both regexes match at most once (leftmost
    #    '?'), so the DuckDB replica needs no 'g'-flag care here.
    q = F.regexp_extract(u, r"\?(.*)$", 1)
    base = F.regexp_replace(F.regexp_replace(u, r"\?.*$", ""),
                            r"/+$", "")
    kept = F.filter(F.split(q, "&"),
                    lambda p: (~p.startswith("utm_")) & (p != F.lit("")))
    canon_q = F.array_join(F.array_sort(kept), "&")
    return F.when(canon_q == "", base).otherwise(
        F.concat(base, F.lit("?"), canon_q))


#: DuckDB replica of canonical_url (RE2 '\\1' replacement syntax); keep
#: in lockstep with the expression above — the oracle embeds this.
CANONICAL_URL_SQL = r"""
SELECT u AS _in,
       CASE WHEN cq = '' THEN base ELSE base || '?' || cq END AS _out
FROM (
  SELECT u,
         regexp_replace(regexp_replace(u4, '\?.*$', ''),
                        '/+$', '') AS base,
         -- COALESCE: DuckDB's array_to_string([]) is NULL where
         -- Spark's array_join([]) is '' — without it every URL whose
         -- query is empty after filtering canonicalizes to NULL
         COALESCE(array_to_string(list_sort(list_filter(
             string_split(regexp_extract(u4, '\?(.*)$', 1), '&'),
             p -> NOT starts_with(p, 'utm_') AND p != '')), '&'), '') AS cq
  FROM (
      SELECT u, regexp_replace(regexp_replace(u2,
                 '^(http://[^/:?#]+):80([/?].*)?$', '\1\2'),
                 '^(https://[^/:?#]+):443([/?].*)?$', '\1\2') AS u4
      FROM (
        SELECT u,
               lower(regexp_extract(u1,
                     '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)', 1)) ||
               regexp_replace(u1,
                     '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*', '') AS u2
        FROM (SELECT u, regexp_replace(u, '#.*$', '') AS u1 FROM _urls)
      )
  )
)"""
