"""DuckDB oracle-SQL builders.

Generates, from the SAME shape IR the engine executes, the equivalent SQL
the driver runs side-by-side (CORRECTNESS gate). Column names match the
Ray outputs exactly; value formatting contracts (offending_value, 'null'
sentinel for null urls, integer counts) are shared with
stages/predicates.py.

The pages table is the deterministic generated one; oracles reference it
with read_parquet over the generated directory.
"""

from __future__ import annotations

from shaclapi_ray.fixtures import (
    consistent_page_shape,
    fresh_page_shape,
    lang_shape,
    or_shape,
    target_page_shape,
    url_shape,
)
from shaclapi_ray.pipelines.textstats import (
    DIGIT_RE,
    PUNCT_RE,
    STOPWORDS,
    TOKEN_RE,
    _word_alt_pattern,
)
from shaclapi_ray.shapes.ir import (
    OrConstraint,
    PredicateConstraint,
    Shape,
    pred_to_sql,
)

# html is binary in parquet; regex predicates over it need a decode
COL_MAP = {"html": "decode(html)"}


def pages_rel(pages_dir: str) -> str:
    return f"read_parquet('{pages_dir}/part-*.parquet')"


URLX = "COALESCE(url, 'null')"


def _shape_valid_sql(shape: Shape) -> str:
    """Boolean SQL expression: all column constraints hold."""
    parts = []
    for c in shape.constraints:
        if isinstance(c, OrConstraint):
            parts.append(
                "("
                + " OR ".join(pred_to_sql(o.pred, COL_MAP) for o in c.options)
                + ")"
            )
        elif isinstance(c, PredicateConstraint):
            parts.append(pred_to_sql(c.pred, COL_MAP))
        else:
            raise ValueError(f"non-column constraint in {shape.shape_id}")
    return "(" + " AND ".join(parts) + ")" if parts else "TRUE"


def shape_verdicts_sql(shape: Shape, pages_dir: str) -> str:
    """(url, valid) for one column-only shape."""
    tgt = pred_to_sql(shape.target, COL_MAP)
    return (
        f"SELECT {URLX} AS url, {_shape_valid_sql(shape)} AS valid\n"
        f"FROM {pages_rel(pages_dir)}\nWHERE {tgt}\nORDER BY url, valid"
    )


def _offending_sql(c: PredicateConstraint) -> str:
    col = c.offending_column or sorted(c.columns())[0]
    if c.pred.get("op") == "len_range":
        return f"CAST(length({col}) AS VARCHAR)"
    if col == "warc_ts":
        return "COALESCE(strftime(warc_ts, '%Y-%m-%d %H:%M:%S.%f'), 'null')"
    expr = COL_MAP.get(col, col)
    return f"COALESCE(substr(CAST({expr} AS VARCHAR), 1, 120), 'null')"


def violations_sql(shapes: list[Shape], pages_dir: str) -> str:
    """(url, shape_id, constraint, offending_value) for column constraints —
    one UNION ALL branch per constraint, mirroring the engine's
    per-constraint violation rows."""
    branches = []
    for s in shapes:
        tgt = pred_to_sql(s.target, COL_MAP)
        for c in s.constraints:
            if isinstance(c, OrConstraint):
                fail = (
                    "NOT ("
                    + " OR ".join(pred_to_sql(o.pred, COL_MAP) for o in c.options)
                    + ")"
                )
                off = _offending_sql(c.options[0])
                name = c.name
            elif isinstance(c, PredicateConstraint):
                fail = f"NOT {pred_to_sql(c.pred, COL_MAP)}"
                off = _offending_sql(c)
                name = c.name
            else:
                continue
            branches.append(
                f"SELECT {URLX} AS url, '{s.shape_id}' AS shape_id, "
                f"'{name}' AS \"constraint\", {off} AS offending_value\n"
                f"FROM {pages_rel(pages_dir)} WHERE {tgt} AND {fail}"
            )
    return "\nUNION ALL\n".join(branches) + "\nORDER BY url, shape_id, \"constraint\""


def links_sql(pages_dir: str) -> str:
    return (
        "SELECT url,\n"
        "       t.target_url,\n"
        "       COALESCE(regexp_extract(t.target_url, '^https?://([^/]+)', 1), '') AS host\n"
        f"FROM (SELECT url, unnest(regexp_extract_all(decode(html), 'href=\"([^\"]+)\"', 1)) AS target_url\n"
        f"      FROM {pages_rel(pages_dir)} WHERE url IS NOT NULL) t\n"
        "ORDER BY url, target_url"
    )


def extract_text_sql(pages_dir: str) -> str:
    return f"""
SELECT url,
       trim(regexp_replace(regexp_replace(decode(html), '<[^>]*>', '', 'g'),
                           '\\s+', ' ', 'g'), ' ') AS text,
       length(trim(regexp_replace(regexp_replace(decode(html), '<[^>]*>', '', 'g'),
                                  '\\s+', ' ', 'g'), ' ')) AS n_text_chars
FROM {pages_rel(pages_dir)} WHERE url IS NOT NULL
ORDER BY url
"""


def registrable_domain_sql(pages_dir: str, suffixes=None) -> str:
    """(url, host, suffix, domain) mirroring pipelines/domains.py:
    longest matching suffix on a label boundary, PSL default last-label
    rule, ''-suffix for empty/IPv4 hosts, domain = suffix + one label
    ('' when the host IS a suffix). Builds on url_canonicalize_sql so
    host parsing agrees by construction; any :port is stripped first."""
    from shaclapi_ray.pipelines.domains import DEFAULT_SUFFIXES

    if suffixes is None:
        suffixes = DEFAULT_SUFFIXES
    vals = ", ".join(
        "('" + s.lower().strip(".").replace("'", "''") + "')" for s in suffixes
    )
    return f"""
WITH dom_canon AS ({url_canonicalize_sql(pages_dir)}),
dom_hosts AS (
  SELECT url, regexp_replace(host, ':[0-9]+$', '') AS host FROM dom_canon
),
dom_best AS (
  SELECT url, host,
         (SELECT s FROM (VALUES {vals}) AS sfx(s)
          WHERE dom_hosts.host = s OR dom_hosts.host LIKE '%.' || s
          ORDER BY length(s) DESC, s LIMIT 1) AS msfx
  FROM dom_hosts
),
dom_sfx AS (
  SELECT url, host,
         CASE WHEN host = '' THEN ''
              WHEN regexp_matches(host, '^\\d{{1,3}}(\\.\\d{{1,3}}){{3}}$') THEN ''
              WHEN msfx IS NOT NULL THEN msfx
              ELSE regexp_extract(host, '[^.]*$') END AS suffix
  FROM dom_best
)
SELECT url, host, suffix,
       CASE WHEN suffix = '' OR host = suffix THEN ''
            ELSE array_to_string(
                   list_slice(string_split(host, '.'),
                              len(string_split(host, '.'))
                                - len(string_split(suffix, '.')),
                              len(string_split(host, '.'))), '.') END AS domain
FROM dom_sfx
ORDER BY url
"""


def warc_roundtrip_sql(pages_dir: str) -> str:
    """Identity projection of the pages table: the WARC sink -> source
    roundtrip (pipelines/warc.py) preserves (url, warc_ts, text, lang)
    exactly, so its oracle is the table itself. Null fills use explicit
    CASE (the DuckDB COALESCE-over-parquet epoch_us quirk — CLAUDE.md);
    html is binary and can't ride the VARCHAR union — its byte equality
    is pinned by tests/test_warc.py instead."""
    return f"""
SELECT url, text AS value,
       (CASE WHEN warc_ts IS NULL THEN '-1'
             ELSE CAST(epoch_us(warc_ts) AS VARCHAR) END)
       || '|' ||
       (CASE WHEN lang IS NULL THEN '∅' ELSE lang END) AS extra
FROM {pages_rel(pages_dir)}
"""


def url_canonicalize_sql(pages_dir: str) -> str:
    host = """CASE WHEN scheme='http' THEN regexp_replace(hostport, ':80$', '')
             WHEN scheme='https' THEN regexp_replace(hostport, ':443$', '')
             ELSE hostport END"""
    return f"""
WITH f AS (
  SELECT url, regexp_replace(url, '#.*$', '') AS frag
  FROM {pages_rel(pages_dir)} WHERE url IS NOT NULL
),
p AS (
  SELECT url, frag,
         lower(regexp_extract(frag, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
         lower(regexp_extract(frag, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)) AS hostport,
         regexp_replace(regexp_replace(frag,
           '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*', ''), '/+$', '') AS rest
  FROM f
)
SELECT url,
       CASE WHEN scheme IS NULL OR scheme = '' THEN frag
            ELSE scheme || '://' || {host} || rest END AS canon_url,
       CASE WHEN scheme IS NULL OR scheme = '' THEN ''
            ELSE {host} END AS host
FROM p ORDER BY url
"""


def robots_sql(pages_dir: str, rules) -> str:
    """Oracle for pipelines.robots.robots_filter: same host/path parse
    as url_canonicalize (but the path keeps trailing slashes — robots
    prefixes are literal), rules joined on exact host, winner by
    (score DESC, prefix DESC) with score = 2*len(prefix)+is_allow —
    the identical deterministic order both Ray strategies use."""
    from shaclapi_ray.pipelines.robots import _norm_rules

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    norm = _norm_rules(rules)
    host = """CASE WHEN scheme='http' THEN regexp_replace(hostport, ':80$', '')
             WHEN scheme='https' THEN regexp_replace(hostport, ':443$', '')
             ELSE hostport END"""
    hp = f"""
WITH f AS (
  SELECT url, regexp_replace(url, '#.*$', '') AS frag
  FROM {pages_rel(pages_dir)} WHERE url IS NOT NULL
),
p AS (
  SELECT url, frag,
         lower(regexp_extract(frag, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
         lower(regexp_extract(frag, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)) AS hostport,
         regexp_replace(frag, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*', '') AS rawpath
  FROM f
),
hp AS (
  SELECT url,
         CASE WHEN scheme IS NULL OR scheme = '' THEN '' ELSE {host} END AS host,
         CASE WHEN scheme IS NULL OR scheme = '' THEN ''
              WHEN rawpath = '' THEN '/' ELSE rawpath END AS path
  FROM p
)"""
    if not norm:
        return f"""{hp}
SELECT url, host, path, TRUE AS allowed, '' AS rule
FROM hp ORDER BY url
"""
    vals = ",\n         ".join(
        f"({lit(h)}, {lit(d)}, {lit(px)})" for h, d, px in norm
    )
    return f"""{hp},
r(rhost, directive, prefix) AS (
  VALUES {vals}
),
m AS (
  SELECT hp.url, r.directive, r.prefix,
         2*length(r.prefix) + CASE WHEN r.directive='allow' THEN 1 ELSE 0 END AS score
  FROM hp JOIN r ON hp.host = r.rhost
  WHERE substr(hp.path, 1, length(r.prefix)) = r.prefix
),
w AS (
  SELECT url, directive, prefix,
         ROW_NUMBER() OVER (PARTITION BY url
                            ORDER BY score DESC, prefix DESC) AS rn
  FROM m
)
SELECT hp.url, hp.host, hp.path,
       (win.url IS NULL OR win.directive = 'allow') AS allowed,
       CASE WHEN win.url IS NULL THEN ''
            ELSE win.directive || ':' || win.prefix END AS rule
FROM hp LEFT JOIN (SELECT * FROM w WHERE rn = 1) win ON hp.url = win.url
ORDER BY hp.url
"""


def top_hosts_sql(pages_dir: str, k: int = 5) -> str:
    return f"""
WITH links AS (
  SELECT unnest(regexp_extract_all(decode(html), 'href="([^"]+)"', 1)) AS target_url
  FROM {pages_rel(pages_dir)} WHERE url IS NOT NULL
)
SELECT COALESCE(regexp_extract(target_url, '^https?://([^/]+)', 1), '') AS host,
       count(*) AS n
FROM links GROUP BY host ORDER BY n DESC, host LIMIT {k}
"""


def host_curation_sql(
    pages_dir: str | None = None,
    max_dup_pct: int = 10,
    min_mean_tokens: int = 0,
    min_docs: int = 2,
    src: str | None = None,
) -> str:
    """Mirror of pipelines.hostcure.host_curation: per-host doc counts,
    corpus-wide exact-dup doc counts, token sums, and the INTEGER-EXACT
    blocked verdict (no float thresholds — both sides compare bigints).
    Host = the literal top_hosts/links regex over the page's own url;
    dup = the page's coalesce(text,'') occurs >1 times corpus-wide.
    ``src`` (a relation/CTE string) overrides the parquet read — the
    composition seam curate_pages_sql chains through."""
    return f"""
WITH q AS (
  SELECT COALESCE(regexp_extract(url, '^https?://([^/]+)', 1), '') AS host,
         coalesce(text, '') AS text
  FROM {src or pages_rel(pages_dir)}
),
c AS (SELECT text, count(*) AS n_text FROM q GROUP BY text),
d AS (
  SELECT q.host,
         CASE WHEN c.n_text > 1 THEN 1 ELSE 0 END AS is_dup,
         length(regexp_extract_all(q.text, '\\S+')) AS n_tok
  FROM q JOIN c USING (text)
)
SELECT host,
       count(*)::BIGINT AS n_docs,
       sum(is_dup)::BIGINT AS n_dup,
       sum(n_tok)::BIGINT AS sum_tokens,
       (count(*) >= {min_docs} AND (
          100 * sum(is_dup) > {max_dup_pct} * count(*)
          OR sum(n_tok) < {min_mean_tokens} * count(*)
       )) AS blocked
FROM d GROUP BY host ORDER BY host
"""


def filter_by_host_sql(
    pages_dir: str,
    max_dup_pct: int = 10,
    min_mean_tokens: int = 0,
    min_docs: int = 2,
) -> str:
    """Pages surviving pipelines.hostcure.filter_by_host against the
    host_curation verdicts learned from the same corpus."""
    v = host_curation_sql(pages_dir, max_dup_pct, min_mean_tokens, min_docs)
    return f"""
WITH v AS ({v}),
p AS (
  SELECT url,
         COALESCE(regexp_extract(url, '^https?://([^/]+)', 1), '') AS host
  FROM {pages_rel(pages_dir)}
)
SELECT p.url FROM p LEFT JOIN v USING (host)
WHERE NOT coalesce(v.blocked, false)
ORDER BY url NULLS FIRST
"""


_TS_MIN = -9223372036854775808  # null warc_ts sorts oldest on both sides


def anchor_profile_sql(pages_dir: str) -> str:
    """Mirror of pipelines.anchors.anchor_text_profile: per-target
    inbound anchor aggregation (counts, distinct sources/anchors, most
    frequent anchor with count-desc/lexicographic-asc tie-break).
    Null-url source pages carry no links (matches links_sql)."""
    pat = '<a href="([^"]+)"[^>]*>([^<]*)</a>'
    return f"""
WITH tags AS (
  SELECT url AS src,
         unnest(regexp_extract_all(decode(html), '{pat}', 0)) AS tag
  FROM {pages_rel(pages_dir)} WHERE url IS NOT NULL
),
pairs AS (
  SELECT src,
         regexp_extract(tag, '{pat}', 1) AS target,
         regexp_extract(tag, '{pat}', 2) AS anchor
  FROM tags
),
pa_ AS (
  SELECT target, anchor, count(*)::BIGINT AS n
  FROM pairs GROUP BY target, anchor
),
top AS (
  SELECT target, anchor AS top_anchor,
         row_number() OVER (
           PARTITION BY target ORDER BY n DESC, anchor ASC
         ) AS rn
  FROM pa_
),
agg AS (
  SELECT target,
         count(*)::BIGINT AS n_inlinks,
         count(DISTINCT src)::BIGINT AS n_unique_sources,
         count(DISTINCT anchor)::BIGINT AS n_distinct_anchors
  FROM pairs GROUP BY target
)
SELECT agg.target AS target_url, n_inlinks, n_unique_sources,
       n_distinct_anchors, t.top_anchor
FROM agg JOIN top AS t ON agg.target = t.target AND t.rn = 1
ORDER BY target_url
"""


def outlink_profile_sql(pages_dir: str) -> str:
    """Mirror of pipelines.anchors.outlink_profile: per-source-url
    outbound link aggregation — page copies, total links, distinct
    target hosts, own-host (internal) links. Equality semantics:
    n_internal counts targets whose extracted host string equals the
    page's own (COALESCE-'') host — identical expression both sides."""
    return f"""
WITH p AS (
  SELECT url,
         COALESCE(regexp_extract(url, '^https?://([^/]+)', 1), '') AS own_host,
         regexp_extract_all(decode(html), 'href="([^"]+)"', 1) AS targets
  FROM {pages_rel(pages_dir)} WHERE url IS NOT NULL
),
pages_agg AS (SELECT url, count(*)::BIGINT AS n_pages FROM p GROUP BY url),
e AS (SELECT url, own_host, unnest(targets) AS t FROM p),
l AS (
  SELECT url, own_host,
         COALESCE(regexp_extract(t, '^https?://([^/]+)', 1), '') AS thost
  FROM e
),
agg AS (
  SELECT url,
         count(*)::BIGINT AS n_links,
         count(DISTINCT thost)::BIGINT AS n_unique_hosts,
         sum(CASE WHEN thost = own_host THEN 1 ELSE 0 END)::BIGINT
           AS n_internal
  FROM l GROUP BY url
)
SELECT pa.url AS url, pa.n_pages AS n_pages,
       coalesce(agg.n_links, 0) AS n_links,
       coalesce(agg.n_unique_hosts, 0) AS n_unique_hosts,
       coalesce(agg.n_internal, 0) AS n_internal
FROM pages_agg AS pa LEFT JOIN agg USING (url)
ORDER BY url
"""


def latest_snapshot_sql(pages_dir: str) -> str:
    """Mirror of pipelines.freshness.latest_snapshot: keep each url's
    newest capture — max (warc_ts, md5(text)) per url group (NULL urls
    their own group) — with keep-all-ties semantics: the winner's VALUE
    tuple is joined back, so rows byte-identical in (url, warc_ts, text)
    all survive (exact_dedup owns collapsing those). The md5 tie-break
    is DuckDB md5_number_lower/upper == stages/md5kernel.md5_pair.
    Returns (url, ts) with ts = epoch microseconds."""
    return f"""
WITH r AS (
  SELECT url,
         coalesce(epoch_us(warc_ts), {_TS_MIN}) AS ts,
         md5_number_lower(coalesce(text, '')) AS tl,
         md5_number_upper(coalesce(text, '')) AS tu
  FROM {pages_rel(pages_dir)}
),
w AS (
  SELECT url, ts, tl, tu,
         row_number() OVER (
           PARTITION BY url ORDER BY ts DESC, tl DESC, tu DESC
         ) AS rn
  FROM r
)
SELECT r.url AS url, r.ts AS ts
FROM r JOIN (SELECT url, ts, tl, tu FROM w WHERE rn = 1) AS b
  ON r.url IS NOT DISTINCT FROM b.url
 AND r.ts = b.ts AND r.tl = b.tl AND r.tu = b.tu
ORDER BY r.url NULLS FIRST, r.ts
"""


def corpus_composition_sql(pages_dir: str, period: str = "month") -> str:
    """Oracle for pipelines.profile.corpus_composition: exact integer
    rollup per (host, calendar-truncated capture period, lang). Same
    host regex, same \\S+-run token count, null ts -> -1 bucket, null
    lang its own group (GROUP BY groups NULLs together on both sides).
    The null-ts fill is an explicit CASE, not COALESCE: this DuckDB
    build mis-evaluates COALESCE(epoch_us(date_trunc(...)), -1) to
    NULL over the parquet scan path (fine over registered tables)."""
    if period not in ("month", "day"):
        raise ValueError(f"unknown period {period!r}")
    return f"""
SELECT COALESCE(regexp_extract(url, '^https?://([^/]+)', 1), '') AS host,
       CASE WHEN warc_ts IS NULL THEN -1
            ELSE epoch_us(date_trunc('{period}', warc_ts)) END AS period_us,
       lang,
       COUNT(*)::BIGINT AS n_docs,
       SUM(COALESCE(length(regexp_extract_all(text, '\\S+')), 0))::BIGINT
         AS n_tokens
FROM {pages_rel(pages_dir)}
GROUP BY host, period_us, lang
ORDER BY host, period_us, lang NULLS FIRST
"""


def snapshot_delta_sql(old_src: str, new_src: str) -> str:
    """Mirror of pipelines.freshness.snapshot_delta: per-url-key diff of
    two pages-shaped relations. Each side's representative capture is
    its latest_snapshot winner (max (ts, md5(text)) per url, NULL urls
    their own group — ROW_NUMBER is safe here because full-tuple ties
    share identical VALUES and only the values are compared); the FULL
    OUTER JOIN on url IS NOT DISTINCT FROM matches the Ray side's
    128-bit key + isnull-bit grouping. ``old_src``/``new_src`` are
    relation names or parenthesized subqueries with (url, warc_ts,
    text). Absent-side fills (-1 ts, 0 cnt) match _pair_sides."""

    def side(src: str) -> str:
        return f"""
  SELECT url, ts, tl, tu, cnt FROM (
    SELECT url, ts, tl, tu,
           row_number() OVER (
             PARTITION BY url ORDER BY ts DESC, tl DESC, tu DESC
           ) AS rn,
           count(*) OVER (PARTITION BY url) AS cnt
    FROM (
      SELECT url,
             coalesce(epoch_us(warc_ts), {_TS_MIN}) AS ts,
             md5_number_lower(coalesce(text, '')) AS tl,
             md5_number_upper(coalesce(text, '')) AS tu
      FROM {src}
    )
  ) WHERE rn = 1"""

    return f"""
WITH ow AS ({side(old_src)}),
nw AS ({side(new_src)})
SELECT coalesce(o.url, n.url) AS url,
       CASE WHEN o.ts IS NULL THEN 'added'
            WHEN n.ts IS NULL THEN 'removed'
            WHEN o.tl = n.tl AND o.tu = n.tu THEN 'unchanged'
            ELSE 'changed' END AS status,
       coalesce(o.ts, -1) AS old_ts,
       coalesce(n.ts, -1) AS new_ts,
       coalesce(o.cnt, 0) AS old_cnt,
       coalesce(n.cnt, 0) AS new_cnt
FROM ow AS o FULL OUTER JOIN nw AS n
  ON o.url IS NOT DISTINCT FROM n.url
ORDER BY url NULLS FIRST, status
"""


def cap_per_host_sql(pages_dir: str, k: int) -> str:
    """Mirror of pipelines.freshness.cap_per_host: RANK() <= k per host
    over the order (url NULLS FIRST, warc_ts) — RANK (not ROW_NUMBER)
    so rows tying on (url, ts) share fate on both sides, which is why
    neither side needs a text hash (or the text column) at all.
    Host = the literal top_hosts/links regex over the page's own url."""
    return f"""
WITH r AS (
  SELECT url,
         COALESCE(regexp_extract(url, '^https?://([^/]+)', 1), '') AS host,
         coalesce(epoch_us(warc_ts), {_TS_MIN}) AS ts
  FROM {pages_rel(pages_dir)}
),
w AS (
  SELECT url, host, ts,
         rank() OVER (
           PARTITION BY host ORDER BY url ASC NULLS FIRST, ts ASC
         ) AS rk
  FROM r
)
SELECT url, host, ts FROM w WHERE rk <= {k}
ORDER BY url NULLS FIRST, ts
"""


# --- pages-chain composition seam: full-row survivor variants of the
# curation stages, each taking a pages-shaped relation string `src`
# (url, warc_ts, text) and returning the same shape, so
# curate_pages_sql can CTE-chain them exactly like preprocess_corpus's
# oracle chains its document stages.


def latest_rows_sql(src: str) -> str:
    """Full rows surviving latest_snapshot over the relation NAME
    ``src`` (same winner semantics as latest_snapshot_sql, projecting
    the original columns). ``src`` must be a CTE/table name — the
    composition convention every chained generator here follows.
    The hashed projection is ONE nested CTE referenced by both the row
    side and the winner side, so every text is md5'd once, not twice."""
    return f"""
WITH hashed AS (
  SELECT url, warc_ts, text,
         coalesce(epoch_us(warc_ts), {_TS_MIN}) AS ts,
         md5_number_lower(coalesce(text, '')) AS tl,
         md5_number_upper(coalesce(text, '')) AS tu
  FROM {src}
)
SELECT r.url AS url, r.warc_ts AS warc_ts, r.text AS text
FROM hashed AS r
JOIN (
  SELECT url, ts, tl, tu FROM (
    SELECT url, ts, tl, tu,
           row_number() OVER (
             PARTITION BY url ORDER BY ts DESC, tl DESC, tu DESC
           ) AS rn
    FROM hashed
  ) WHERE rn = 1
) AS b
  ON r.url IS NOT DISTINCT FROM b.url
 AND r.ts = b.ts AND r.tl = b.tl AND r.tu = b.tu
"""


def filter_hosts_rows_sql(
    src: str,
    max_dup_pct: int = 10,
    min_mean_tokens: int = 0,
    min_docs: int = 2,
) -> str:
    """Full rows surviving filter_by_host against host_curation verdicts
    learned from the SAME ``src`` relation."""
    v = host_curation_sql(
        src=src,
        max_dup_pct=max_dup_pct,
        min_mean_tokens=min_mean_tokens,
        min_docs=min_docs,
    )
    return f"""
WITH v AS ({v}),
p AS (
  SELECT url, warc_ts, text,
         COALESCE(regexp_extract(url, '^https?://([^/]+)', 1), '') AS host
  FROM {src}
)
SELECT p.url AS url, p.warc_ts AS warc_ts, p.text AS text
FROM p LEFT JOIN v USING (host)
WHERE NOT coalesce(v.blocked, false)
"""


def cap_rows_sql(src: str, k: int) -> str:
    """Full rows surviving cap_per_host over the relation NAME ``src``
    (RANK <= k per host over (url NULLS FIRST, ts), ties keep
    together)."""
    return f"""
SELECT url, warc_ts, text FROM (
  SELECT url, warc_ts, text,
         rank() OVER (
           PARTITION BY COALESCE(regexp_extract(url, '^https?://([^/]+)', 1), '')
           ORDER BY url ASC NULLS FIRST,
                    coalesce(epoch_us(warc_ts), {_TS_MIN}) ASC
         ) AS rk
  FROM {src}
) WHERE rk <= {k}
"""


def curate_pages_sql(
    pages_dir: str,
    cap_k: int,
    max_dup_pct: int = 10,
    min_mean_tokens: int = 0,
    min_docs: int = 2,
    urlq_kw: dict | None = None,
) -> str:
    """Mirror of pipelines.curate.curate_pages: [optional URL gate] ->
    latest_snapshot -> filter_by_host(host_curation learned on the
    snapshot-filtered stream) -> cap_per_host, composed by chaining
    each stage's rows generator through its ``src`` seam (the
    preprocess_corpus oracle pattern). Returns (url, ts)."""
    s2 = filter_hosts_rows_sql(
        "s1",
        max_dup_pct=max_dup_pct,
        min_mean_tokens=min_mean_tokens,
        min_docs=min_docs,
    )
    s0 = ""
    latest_src = "src0"
    if urlq_kw is not None:
        s0 = f"s0 AS ({url_quality_rows_sql('src0', **urlq_kw)}),\n"
        latest_src = "s0"
    return f"""
WITH src0 AS (SELECT url, warc_ts, text FROM {pages_rel(pages_dir)}),
{s0}s1 AS ({latest_rows_sql(latest_src)}),
s2 AS ({s2}),
s3 AS ({cap_rows_sql("s2", cap_k)})
SELECT url, coalesce(epoch_us(warc_ts), {_TS_MIN}) AS ts
FROM s3
ORDER BY url NULLS FIRST, ts
"""


def linked_page_verdicts_sql(pages_dir: str) -> str:
    child = target_page_shape()
    child_valid = _shape_valid_sql(child)
    return f"""
WITH pages AS (SELECT * FROM {pages_rel(pages_dir)}),
links AS (
  SELECT url, unnest(regexp_extract_all(decode(html), 'href="([^"]+)"', 1)) AS target_url
  FROM pages WHERE url IS NOT NULL
),
child_valid AS (
  SELECT DISTINCT url FROM pages WHERE url IS NOT NULL AND {child_valid}
),
qcount AS (
  SELECT l.url, count(*) AS q
  FROM links l JOIN child_valid c ON l.target_url = c.url
  GROUP BY l.url
)
SELECT {URLX.replace('url', 'p.url')} AS url, COALESCE(q.q, 0) >= 1 AS valid
FROM pages p LEFT JOIN qcount q ON p.url = q.url
WHERE p.lang = 'en'
ORDER BY url, valid
"""


def inverse_linked_verdicts_sql(pages_dir: str) -> str:
    """(url, valid) for PopularPageShape: >=1 INBOUND link edge from a
    TargetPageShape-valid source page (sh:inversePath semantics — counts
    link instances grouped by target_url)."""
    child = target_page_shape()
    child_valid = _shape_valid_sql(child)
    return f"""
WITH pages AS (SELECT * FROM {pages_rel(pages_dir)}),
links AS (
  SELECT url, unnest(regexp_extract_all(decode(html), 'href="([^"]+)"', 1)) AS target_url
  FROM pages WHERE url IS NOT NULL
),
child_valid AS (
  SELECT DISTINCT url FROM pages WHERE url IS NOT NULL AND {child_valid}
),
qcount AS (
  SELECT l.target_url AS t_url, count(*) AS q
  FROM links l JOIN child_valid c ON l.url = c.url
  GROUP BY l.target_url
)
SELECT {URLX.replace('url', 'p.url')} AS url, COALESCE(q.q, 0) >= 1 AS valid
FROM pages p LEFT JOIN qcount q ON p.url = q.t_url
ORDER BY url, valid
"""


def unique_url_verdicts_sql(pages_dir: str) -> str:
    return (
        f"SELECT u AS url, cnt = 1 AS valid FROM (\n"
        f"  SELECT {URLX} AS u, count(*) OVER (PARTITION BY {URLX}) AS cnt\n"
        f"  FROM {pages_rel(pages_dir)}\n) ORDER BY url, valid"
    )


def verdict_counts_sql(shapes: list[Shape], pages_dir: str) -> str:
    branches = [
        f"SELECT '{s.shape_id}' AS shape_id, {_shape_valid_sql(s)} AS valid\n"
        f"FROM {pages_rel(pages_dir)} WHERE {pred_to_sql(s.target, COL_MAP)}"
        for s in shapes
    ]
    u = "\nUNION ALL\n".join(branches)
    return (
        f"SELECT shape_id, valid, count(*) AS n FROM (\n{u}\n) "
        "GROUP BY shape_id, valid ORDER BY shape_id, valid"
    )


def verdict_rollup_sql(shapes: list[Shape], pages_dir: str) -> str:
    """DuckDB oracle for ValidationResult.verdict_rollup: per (host,
    shape_id) valid/invalid counts, host = the repo-standard regex with
    '' for null/non-absolute urls."""
    host = "COALESCE(regexp_extract(url, '^https?://([^/]+)', 1), '') AS host"
    branches = [
        f"SELECT {host}, '{s.shape_id}' AS shape_id, "
        f"{_shape_valid_sql(s)} AS valid\n"
        f"FROM {pages_rel(pages_dir)} WHERE {pred_to_sql(s.target, COL_MAP)}"
        for s in shapes
    ]
    u = "\nUNION ALL\n".join(branches)
    return (
        f"SELECT host, shape_id, "
        "CAST(SUM(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid, "
        "CAST(SUM(CASE WHEN valid THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid "
        f"FROM (\n{u}\n) GROUP BY host, shape_id ORDER BY host, shape_id"
    )


def annotated_pages_sql(pages_dir: str) -> str:
    s = fresh_page_shape()
    return f"""
WITH pages AS (SELECT * FROM {pages_rel(pages_dir)}),
v AS (
  SELECT {URLX} AS v_url, {_shape_valid_sql(s)} AS valid,
         CASE WHEN {_shape_valid_sql(s)} THEN 'FreshPageShape'
              ELSE 'FreshPageShape' END AS reason
  FROM pages WHERE {pred_to_sql(s.target, COL_MAP)}
)
SELECT p.url, p.lang, v.valid, v.reason
FROM pages p LEFT JOIN v ON p.url = v.v_url
ORDER BY p.url NULLS FIRST, p.lang
"""


# ---------------------------------------------------------------------------
# documents / embeddings / events oracles
# ---------------------------------------------------------------------------


def token_count_sql() -> str:
    from shaclapi_ray.pipelines.textstats import BPE_TOKEN_RE

    bpe = BPE_TOKEN_RE.replace("'", "''")  # SQL string-literal escaping
    return (
        f"SELECT doc_id, length(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens, "
        f"length(regexp_extract_all(text, '{bpe}')) AS n_bpe_tokens "
        "FROM documents ORDER BY doc_id"
    ).replace("\\", "\\")


def sample_corpus_sql(fraction: float, seed: int = 0) -> str:
    from shaclapi_ray.pipelines.textstats import SAMPLE_KNUTH

    threshold = int(fraction * (1 << 32))
    return f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE ((doc_id + {seed}) * {SAMPLE_KNUTH}) % 4294967296 < {threshold}
ORDER BY doc_id
"""


def sample_stratified_sql(
    fractions: dict[str, float],
    group_col: str = "lang",
    default: float = 0.0,
    seed: int = 0,
) -> str:
    """Oracle for sample_stratified: same Knuth arithmetic, per-group
    threshold via CASE."""
    from shaclapi_ray.pipelines.textstats import SAMPLE_KNUTH

    cases = " ".join(
        f"WHEN COALESCE({group_col}, '') = '{g}' THEN {int(f * (1 << 32))}"
        for g, f in sorted(fractions.items())
    )
    return f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE ((doc_id + {seed}) * {SAMPLE_KNUTH}) % 4294967296
      < (CASE {cases} ELSE {int(default * (1 << 32))} END)
ORDER BY doc_id
"""


def mix_corpora_parts(
    epochs: dict[str, float],
    source_wheres: dict[str, str],
    seed: int = 0,
) -> list[tuple[str, str]]:
    """Oracle parts for pipelines.mixing.mix_corpora over the documents
    table: one ("{source}:{epoch}", SELECT ...) pair per epoch copy —
    full copies unfiltered, the fractional copy with the identical
    Knuth arithmetic and (sorted-source-index, epoch) salt as the Ray
    operator. source_wheres maps each source name to its WHERE clause
    over documents ('' = whole table)."""
    from shaclapi_ray.pipelines.mixing import _frac_threshold, mix_salt
    from shaclapi_ray.pipelines.textstats import SAMPLE_KNUTH

    cols = "doc_id, text, lang, source, n_chars"
    parts: list[tuple[str, str]] = []
    for si, name in enumerate(sorted(source_wheres)):
        e = float(epochs.get(name, 0.0))
        full = int(e)
        frac = e - full
        where = source_wheres[name]
        base = f"SELECT {cols} FROM documents"
        if where:
            base += f" WHERE {where}"
        for k in range(full):
            parts.append((f"{name}:{k}", base))
        if frac > 1e-12:
            salt = mix_salt(seed, si, full)
            cond = (
                f"((doc_id + {salt}) * {SAMPLE_KNUTH}) % 4294967296"
                f" < {_frac_threshold(frac)}"
            )
            joiner = " AND " if where else " WHERE "
            parts.append((f"{name}:{full}", base + joiner + cond))
    assert parts, "empty mix"
    return parts


def split_corpus_sql(fractions: dict[str, float], seed: int = 0) -> str:
    """Oracle for pipelines.mixing.split_corpus: the same Knuth-hash band
    assignment as a CASE over cumulative thresholds."""
    import numpy as np

    from shaclapi_ray.pipelines.textstats import SAMPLE_KNUTH

    names = list(fractions)
    edges = np.cumsum([int(fractions[n] * (1 << 32)) for n in names])
    edges[-1] = 1 << 32
    h = f"((doc_id + {seed}) * {SAMPLE_KNUTH}) % 4294967296"
    cases = " ".join(
        f"WHEN {h} < {int(edges[i])} THEN '{names[i]}'" for i in range(len(names) - 1)
    )
    return f"""
SELECT doc_id, text, lang, source, n_chars,
       CASE {cases} ELSE '{names[-1]}' END AS split
FROM documents ORDER BY doc_id
"""


def split_corpus_parts(
    fractions: dict[str, float], seed: int = 0
) -> list[tuple[str, str]]:
    """split_corpus as per-band (name, SELECT) pairs for tagged-union
    slot composition."""
    import numpy as np

    from shaclapi_ray.pipelines.textstats import SAMPLE_KNUTH

    names = list(fractions)
    edges = np.cumsum([int(fractions[n] * (1 << 32)) for n in names])
    edges[-1] = 1 << 32
    h = f"((doc_id + {seed}) * {SAMPLE_KNUTH}) % 4294967296"
    cols = "doc_id, text, lang, source, n_chars"
    parts = []
    lo = 0
    for i, name in enumerate(names):
        hi = int(edges[i])
        cond = f"{h} >= {lo} AND {h} < {hi}" if lo else f"{h} < {hi}"
        parts.append((name, f"SELECT {cols} FROM documents WHERE {cond}"))
        lo = hi
    return parts


def pii_scan_sql() -> str:
    from shaclapi_ray.pipelines.textstats import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
SELECT doc_id,
       length(regexp_extract_all(text, '{EMAIL_RE}')) AS email_count,
       length(regexp_extract_all(text, '{IPV4_RE}')) AS ipv4_count,
       length(regexp_extract_all(text, '{PHONE_RE}')) AS phone_count,
       regexp_replace(regexp_replace(regexp_replace(text,
         '{EMAIL_RE}', '<EMAIL>', 'g'), '{IPV4_RE}', '<IP>', 'g'),
         '{PHONE_RE}', '<PHONE>', 'g') AS red_text
FROM documents ORDER BY doc_id
"""


def dedup_corpus_sql(src: str = "documents") -> str:
    return f"""
SELECT doc_id, text, lang, source, n_chars FROM {src}
WHERE doc_id IN (SELECT min(doc_id) FROM {src} GROUP BY coalesce(text, ''))
ORDER BY doc_id
"""


def dedup_incremental_sql() -> str:
    """Oracle for the incremental-dedup slot component: even doc_ids are
    the persisted corpus state, odd doc_ids the new snapshot filtered
    against it by exact text content (pipelines.dedup.dedup_incremental
    with persist_dedup_state over the even half)."""
    return """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'state'
            WHEN coalesce(text, '') IN (
                SELECT coalesce(text, '') FROM documents WHERE doc_id % 2 = 0)
            THEN 'dup'
            ELSE 'kept' END AS inc_state
FROM documents
"""


def chunk_text_sql(chunk_chars: int, overlap: int) -> str:
    stride = chunk_chars - overlap
    return f"""
SELECT doc_id, i AS chunk_id,
       substr(text, i * {stride} + 1, {chunk_chars}) AS chunk,
       length(substr(text, i * {stride} + 1, {chunk_chars})) AS n_chunk_chars
FROM documents,
     LATERAL unnest(generate_series(0,
       CAST(floor((length(text) - 1) / {stride}) AS BIGINT))) AS u(i)
WHERE length(text) > 0
ORDER BY doc_id, chunk_id
"""


def doc_frequency_sql(min_df: int = 1) -> str:
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents
)
SELECT token, count(*) AS df FROM toks
GROUP BY token HAVING count(*) >= {min_df} ORDER BY token
"""


def inverted_index_sql(min_df: int = 2, max_df: int | None = None) -> str:
    """Mirror of pipelines.textstats.inverted_index: distinct (doc, token)
    pairs, ascending-doc_id CSV posting list, df-band filter."""
    cap = f"AND count(*) <= {max_df}" if max_df is not None else ""
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents
)
SELECT token, count(*)::BIGINT AS df,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM toks GROUP BY token HAVING count(*) >= {min_df} {cap} ORDER BY token
"""


def unigram_logprob_sql() -> str:
    """Mirror of pipelines.textstats.unigram_logprob: natural log of
    corpus-unigram probability, per-doc mean, 0.0 for empty docs."""
    return """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents
),
tf AS (SELECT token, count(*)::DOUBLE AS c FROM toks GROUP BY token),
tot AS (SELECT sum(c) AS t FROM tf),
sc AS (
  SELECT toks.doc_id, avg(ln(tf.c / tot.t)) AS logprob
  FROM toks JOIN tf USING (token), tot GROUP BY toks.doc_id
)
SELECT d.doc_id, length(regexp_extract_all(d.text, '\\S+'))::BIGINT AS n_tokens,
       coalesce(sc.logprob, 0.0) AS logprob
FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY doc_id
"""


def bigram_logprob_sql(lam: float | None = None, src: str = "documents") -> str:
    """Mirror of pipelines.textstats.bigram_logprob: interpolated-bigram
    mean log-probability — position 1 scores ln(c1/T), later positions
    ln(lam*c2/c1_prev + (1-lam)*c1/T), averaged over all positions."""
    if lam is None:
        from shaclapi_ray.pipelines.textstats import BIGRAM_LAMBDA

        lam = BIGRAM_LAMBDA
    l, m = repr(float(lam)), repr(1.0 - float(lam))
    return f"""
WITH base AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\\S+') AS toks FROM {src}
),
uni AS (SELECT doc_id, unnest(toks) AS w FROM base),
c1 AS (SELECT w, count(*)::DOUBLE AS c FROM uni GROUP BY w),
tot AS (SELECT sum(c) AS t FROM c1),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> {{'u': toks[i], 'w': toks[i+1]}})) AS pr
  FROM base
),
c2 AS (
  SELECT pr.u AS u, pr.w AS w, count(*)::DOUBLE AS c FROM big GROUP BY pr.u, pr.w
),
t1 AS (
  SELECT f.doc_id, ln(c1.c / tot.t) AS v
  FROM (SELECT doc_id, toks[1] AS w FROM base WHERE len(toks) >= 1) f
  JOIN c1 USING (w), tot
),
t2 AS (
  SELECT big.doc_id,
         ln({l} * c2.c / cu.c + {m} * cw.c / tot.t) AS v
  FROM big
  JOIN c2 ON big.pr.u = c2.u AND big.pr.w = c2.w
  JOIN c1 cu ON big.pr.u = cu.w
  JOIN c1 cw ON big.pr.w = cw.w, tot
),
sc AS (
  SELECT doc_id, avg(v) AS bigram_logprob
  FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2) GROUP BY doc_id
)
SELECT d.doc_id,
       length(regexp_extract_all(coalesce(d.text, ''), '\\S+'))::BIGINT AS n_tokens,
       coalesce(sc.bigram_logprob, 0.0) AS bigram_logprob
FROM {src} d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id
"""


def gopher_rules_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    src: str = "documents",
) -> str:
    """Mirror of pipelines.textstats.gopher_rules (Rae et al. 2021 Table
    A1 rules; ratios rounded to 6 decimals before thresholding)."""
    from shaclapi_ray.pipelines.textstats import GOPHER_STOPWORDS

    stop_alt = "|".join(GOPHER_STOPWORDS)
    trim = "trim(l, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))"
    return f"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS text FROM {src}
),
doc AS (
  SELECT doc_id,
         length(regexp_extract_all(text, '\\S+'))::BIGINT AS n_words,
         length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS nchars,
         length(regexp_extract_all(text, '#|\\.\\.\\.'))::BIGINT AS sym
  FROM base
),
lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM base
),
lstat AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines,
         sum(CASE WHEN regexp_matches({trim}, '^[-*•]') THEN 1 ELSE 0 END)::BIGINT AS n_bullet,
         sum(CASE WHEN regexp_matches({trim}, '(\\.\\.\\.|…)$') THEN 1 ELSE 0 END)::BIGINT AS n_ellip
  FROM lines GROUP BY doc_id
),
words AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w FROM base
),
wstat AS (
  SELECT doc_id,
         sum(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0 END)::BIGINT AS n_alpha,
         count(DISTINCT CASE WHEN regexp_matches(w, '^({stop_alt})$') THEN w END)::BIGINT AS n_stop_hits
  FROM words GROUP BY doc_id
),
sig AS (
  SELECT d.doc_id, d.n_words,
         round(CASE WHEN d.n_words > 0 THEN d.nchars::DOUBLE / d.n_words ELSE 0.0 END, 6) AS mean_word_len,
         round(CASE WHEN d.n_words > 0 THEN d.sym::DOUBLE / d.n_words ELSE 0.0 END, 6) AS symbol_ratio,
         round(ls.n_bullet::DOUBLE / ls.n_lines, 6) AS bullet_frac,
         round(ls.n_ellip::DOUBLE / ls.n_lines, 6) AS ellipsis_frac,
         round(CASE WHEN d.n_words > 0 THEN coalesce(ws.n_alpha, 0)::DOUBLE / d.n_words ELSE 0.0 END, 6) AS alpha_frac,
         coalesce(ws.n_stop_hits, 0)::BIGINT AS n_stop_hits
  FROM doc d JOIN lstat ls USING (doc_id) LEFT JOIN wstat ws USING (doc_id)
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
       ellipsis_frac, alpha_frac, n_stop_hits,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND mean_word_len >= {min_mean_word_len} AND mean_word_len <= {max_mean_word_len}
        AND symbol_ratio <= {max_symbol_ratio}
        AND bullet_frac <= {max_bullet_frac}
        AND ellipsis_frac <= {max_ellipsis_frac}
        AND alpha_frac >= {min_alpha_frac}
        AND n_stop_hits >= {min_stop_hits}) AS gopher_pass
FROM sig ORDER BY doc_id
"""


def clean_lines_sql(
    min_words: int = 5,
    require_terminal_punct: bool = True,
    drop_brace_lines: bool = True,
    dedup_lines: bool = True,
    src: str = "documents",
) -> str:
    """Mirror of pipelines.textstats.clean_lines (C4 line rules +
    within-doc first-occurrence line dedup)."""
    trim = "trim(l, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))"
    conds = [f"length(regexp_extract_all({trim}, '\\S+')) >= {min_words}"]
    if require_terminal_punct:
        conds.append(f"regexp_matches({trim}, '[.!?\"]$')")
    if drop_brace_lines:
        conds.append("NOT contains(l, '{')")
    where = " AND ".join(conds)
    occ_filter = "WHERE occ = 1" if dedup_lines else ""
    return f"""
WITH lines AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), chr(10))) AS l,
         unnest(range(len(string_split(coalesce(text, ''), chr(10))))) AS idx
  FROM {src}
),
totals AS (SELECT doc_id, count(*)::BIGINT AS n_lines FROM lines GROUP BY doc_id),
keep AS (SELECT doc_id, idx, l FROM lines WHERE {where}),
occ AS (
  SELECT doc_id, idx, l,
         row_number() OVER (PARTITION BY doc_id, l ORDER BY idx) AS occ
  FROM keep
),
agg AS (
  SELECT doc_id, string_agg(l, chr(10) ORDER BY idx) AS clean_text,
         count(*)::BIGINT AS n_kept_lines
  FROM occ {occ_filter} GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
       coalesce(a.n_kept_lines, 0) AS n_kept_lines,
       (t.n_lines - coalesce(a.n_kept_lines, 0)) AS n_dropped_lines
FROM {src} d JOIN totals t USING (doc_id)
LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
"""


def ccnet_buckets_sql(
    q1: float = 1.0 / 3.0, q2: float = 2.0 / 3.0, precision: int = 1000
) -> str:
    """Mirror of pipelines.textstats.ccnet_buckets: per-lang exact rank
    quantiles over the integer-quantized unigram logprob, head/middle/
    tail assignment."""
    return f"""
WITH lp AS ({unigram_logprob_sql()}),
wl AS (
  SELECT lp.doc_id, d.lang, lp.n_tokens, lp.logprob,
         CAST(floor(lp.logprob * {precision} + 0.5) AS BIGINT) AS score_q
  FROM lp JOIN documents d USING (doc_id)
),
ranked AS (
  SELECT lang, score_q,
         row_number() OVER (PARTITION BY lang ORDER BY score_q) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM wl
),
t1 AS (
  SELECT lang, min(score_q) AS t FROM ranked
  WHERE rn = CAST(ceil(CAST({q1!r} AS DOUBLE) * n) AS BIGINT) GROUP BY lang
),
t2 AS (
  SELECT lang, min(score_q) AS t FROM ranked
  WHERE rn = CAST(ceil(CAST({q2!r} AS DOUBLE) * n) AS BIGINT) GROUP BY lang
)
SELECT wl.doc_id, wl.lang, wl.n_tokens, wl.logprob, wl.score_q,
       CASE WHEN wl.score_q <= t1.t THEN 'tail'
            WHEN wl.score_q <= t2.t THEN 'middle'
            ELSE 'head' END AS bucket
FROM wl JOIN t1 USING (lang) JOIN t2 USING (lang)
ORDER BY doc_id
"""


def tfidf_top_terms_sql(k: int = 5, min_df: int = 1) -> str:
    """Mirror of pipelines.textstats.tfidf_top_terms: tfidf rounded to 6
    decimals BEFORE ranking (ties token-asc), df >= min_df, N = all docs."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
),
df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
),
scored AS (
  SELECT t.doc_id, t.token, t.tf,
         round(t.tf * ln((SELECT count(*) FROM documents) / d.df), 6) AS tfidf
  FROM tf t JOIN df d USING (token)
  WHERE d.df >= {min_df}
),
ranked AS (
  SELECT doc_id, token, tf, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, token) AS rank
  FROM scored
)
SELECT doc_id, token, tf, tfidf, rank FROM ranked WHERE rank <= {k}
ORDER BY doc_id, rank
"""


def rebalance_corpus_sql(seed: int = 0) -> str:
    """Mirror of pipelines.textstats.rebalance_corpus: classify with the
    lang_id stopword heuristic, then keep rows whose Knuth hash clears the
    per-class integer threshold (min_count << 32) // class_count."""
    from shaclapi_ray.pipelines.textstats import SAMPLE_KNUTH

    langs = sorted(STOPWORDS)
    counts = ",\n       ".join(
        f"length(regexp_extract_all(text, '{_word_alt_pattern(STOPWORDS[lang])}')) AS c_{lang}"
        for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    cases = "\n            ".join(
        f"WHEN c_{lang} = {greatest} THEN '{lang}'" for lang in langs
    )
    return f"""
WITH c AS (
  SELECT doc_id,
       {counts}
  FROM documents WHERE text IS NOT NULL
),
l AS (
  SELECT doc_id,
       CASE WHEN {greatest} = 0 THEN 'und'
            {cases}
       END AS lang_pred
  FROM c
),
cnt AS (SELECT lang_pred, count(*) AS n FROM l GROUP BY lang_pred),
thr AS (
  SELECT lang_pred, ((SELECT min(n) FROM cnt) * 4294967296) // n AS t
  FROM cnt
)
SELECT l.doc_id, l.lang_pred
FROM l JOIN thr USING (lang_pred)
WHERE ((l.doc_id + {seed}) * {SAMPLE_KNUTH}) % 4294967296 < thr.t
ORDER BY doc_id
"""


def decontaminate_sql(n: int = 3, eval_mod: int = 37, src: str = "documents") -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(n))
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM {src}
),
grams AS (
  SELECT DISTINCT doc_id, {gram} AS gram
  FROM toks, LATERAL unnest(generate_series(1, length(t) - {n - 1})) AS u(i)
  WHERE length(t) >= {n}
),
eval_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {eval_mod} = 0),
hits AS (
  SELECT g.doc_id, count(*) AS n_hits
  FROM grams g JOIN eval_grams e USING (gram) GROUP BY g.doc_id
)
SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM {src} d LEFT JOIN hits h USING (doc_id) ORDER BY doc_id
"""


def normalize_text_sql() -> str:
    return (
        "SELECT doc_id, trim(regexp_replace(lower(nfc_normalize(text)), "
        "'\\s+', ' ', 'g')) AS norm_text FROM documents ORDER BY doc_id"
    )


def quality_signals_sql() -> str:
    en = _word_alt_pattern(STOPWORDS["en"])
    return f"""
SELECT doc_id,
       length(text) AS n_chars,
       length(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
       length(regexp_extract_all(text, '{PUNCT_RE}')) AS punct_count,
       length(regexp_extract_all(text, '{DIGIT_RE}')) AS digit_count,
       length(regexp_extract_all(text, '{en}')) AS stop_count_en
FROM documents ORDER BY doc_id
"""


def repetition_signals_sql() -> str:
    return r"""
WITH base AS (
  SELECT doc_id,
         length(string_split(text, chr(10))) AS n_lines,
         length(list_distinct(string_split(text, chr(10)))) AS n_unique_lines,
         length(regexp_extract_all(text, '\S+')) AS n_words,
         length(list_distinct(regexp_extract_all(text, '\S+'))) AS n_unique_words
  FROM documents),
wc AS (
  SELECT doc_id, max(c)::BIGINT AS max_word_count FROM (
    SELECT doc_id, count(*) AS c
    FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w FROM documents)
    GROUP BY doc_id, w)
  GROUP BY doc_id)
SELECT base.*, coalesce(wc.max_word_count, 0)::BIGINT AS max_word_count
FROM base LEFT JOIN wc USING (doc_id) ORDER BY doc_id
"""


def top_docs_per_group_sql(k: int, group_col: str = "lang") -> str:
    return f"""
SELECT {group_col}, doc_id, n_chars, rank FROM (
  SELECT {group_col}, doc_id, n_chars,
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents)
WHERE rank <= {k} ORDER BY {group_col}, rank
"""


def lang_id_sql() -> str:
    langs = sorted(STOPWORDS)
    counts = ",\n       ".join(
        f"length(regexp_extract_all(text, '{_word_alt_pattern(STOPWORDS[lang])}')) AS c_{lang}"
        for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    cases = "\n            ".join(
        f"WHEN c_{lang} = {greatest} THEN '{lang}'" for lang in langs
    )
    return f"""
WITH c AS (
  SELECT doc_id,
       {counts}
  FROM documents
)
SELECT doc_id,
       CASE WHEN {greatest} = 0 THEN 'und'
            {cases}
       END AS lang_pred,
       {greatest} AS lang_score
FROM c ORDER BY doc_id
"""


def fingerprint_sql() -> str:
    return "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id"


def nb_classify_sql(label_col: str = "lang", alpha: float = 1.0) -> str:
    """Mirror of pipelines.classify.train_nb + nb_classify (self-train on
    the documents table): multinomial NB with Laplace ``alpha``, priors
    ln(n_c/N), conditionals ln((cnt+alpha)/(N_c+alpha*V)) over the
    corpus-wide distinct-token vocabulary V; prediction = argmax with
    label-ascending tie-break, score = the winner's log-probability."""
    a = float(alpha)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents
),
cls AS (
  SELECT {label_col} AS label, count(*)::DOUBLE AS n_docs FROM documents
  GROUP BY {label_col}
),
tot AS (SELECT count(*)::DOUBLE AS n FROM documents),
tc AS (
  SELECT d.{label_col} AS label, t.token, count(*)::DOUBLE AS cnt
  FROM toks t JOIN documents d USING (doc_id) GROUP BY d.{label_col}, t.token
),
nc AS (SELECT label, sum(cnt) AS n_tok FROM tc GROUP BY label),
vocab AS (SELECT count(DISTINCT token)::DOUBLE AS v FROM toks),
tok_scores AS (
  SELECT t.doc_id, c.label,
         sum(ln((coalesce(tc.cnt, 0) + {a}) / (nc.n_tok + {a} * vocab.v)))
           AS tok_score
  FROM toks t
  CROSS JOIN cls c
  JOIN nc ON nc.label = c.label
  LEFT JOIN tc ON tc.label = c.label AND tc.token = t.token
  CROSS JOIN vocab
  GROUP BY t.doc_id, c.label
),
scored AS (
  SELECT d.doc_id, c.label,
         ln(c.n_docs / tot.n) + coalesce(s.tok_score, 0.0) AS score
  FROM documents d
  CROSS JOIN cls c
  LEFT JOIN tok_scores s ON s.doc_id = d.doc_id AND s.label = c.label
  CROSS JOIN tot
),
ranked AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label) AS rk
  FROM scored
)
SELECT doc_id, label AS nb_pred, score AS nb_score
FROM ranked WHERE rk = 1 ORDER BY doc_id
"""


def exact_dedup_sql() -> str:
    return (
        "SELECT min(doc_id) AS doc_id, count(*) AS n_dups "
        "FROM documents GROUP BY md5(text) ORDER BY doc_id"
    )


def _simhash_sig_cte() -> str:
    """Shared CTE chain computing (doc_id, simhash BIGINT, u HUGEINT)
    per document — the exact semantics of pipelines/dedup.SimHasher:
    whitespace tokens (every occurrence, not distinct), token hash =
    md5_number_lower (upper 8 md5 digest bytes little-endian, matching
    _md5_low64), per-bit ±1 accumulation, bit set iff acc > 0."""
    return """
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\\S+')) AS t
  FROM documents
), th AS (
  SELECT doc_id, md5_number_lower(t)::UBIGINT AS h FROM toks
), bits AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS bit) b
  GROUP BY doc_id, b.bit
), rawsig AS (
  SELECT doc_id,
         SUM(CASE WHEN acc > 0 THEN (1::HUGEINT << bit) ELSE 0 END) AS u
  FROM bits GROUP BY doc_id
), sig AS (
  SELECT d.doc_id,
         coalesce(s.u, 0) AS u,
         CAST(CASE WHEN coalesce(s.u, 0) >= 9223372036854775808::HUGEINT
                   THEN coalesce(s.u, 0) - 18446744073709551616::HUGEINT
                   ELSE coalesce(s.u, 0) END AS BIGINT) AS simhash
  FROM documents d LEFT JOIN rawsig s USING (doc_id)
)"""


def simhash_sql(bucket_bits: int = 16) -> str:
    """(doc_id, simhash, bucket): 64-bit simhash signatures + top-prefix
    bucket, matching pipelines/dedup.simhash_signatures exactly."""
    return f"""
WITH {_simhash_sig_cte()}
SELECT doc_id, simhash,
       CAST((u // {1 << (64 - bucket_bits)}::HUGEINT) % {1 << bucket_bits}
            AS {"INTEGER" if bucket_bits <= 31 else "BIGINT"}) AS bucket
FROM sig ORDER BY doc_id
"""


def simhash_neardup_sql(max_hamming: int = 3, bucket_bits: int = 16) -> str:
    """(a, b, hamming): doc pairs sharing the ``bucket_bits``-bit simhash
    prefix with full-signature hamming distance <= max_hamming — the
    same candidate semantics as pipelines/dedup.simhash_neardup_pairs."""
    div = (1 << (64 - bucket_bits))
    return f"""
WITH {_simhash_sig_cte()}
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM sig x JOIN sig y
  ON (x.u // {div}::HUGEINT) = (y.u // {div}::HUGEINT)
 AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
ORDER BY a, b
"""


def ngram_jaccard_sql(k: int = 5, threshold: float = 0.5) -> str:
    """(a, b, inter_size, union_size): ALL pairs with char-k-gram Jaccard
    >= threshold. The Ray side evaluates the same predicate on LSH
    candidate pairs; equality holds because every fixture pair at or
    above the threshold is high-similarity enough (J >= 0.9) to be an
    LSH candidate with probability ~1 (verified, deterministic seed)."""
    return f"""
WITH g AS (
  SELECT DISTINCT doc_id, substr(text, pos, {k}) AS gram
  FROM documents, LATERAL unnest(generate_series(1, length(text) - {k - 1})) AS t(pos)
  WHERE length(text) >= {k}
),
sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter_size
  FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT i.a, i.b, i.inter_size, sa.n + sb.n - i.inter_size AS union_size
FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
WHERE i.inter_size >= {threshold} * (sa.n + sb.n - i.inter_size)
ORDER BY a, b
"""


def embedding_neardup_sql(tau: float) -> str:
    """(a, b): exact all-pairs cosine >= tau (the bruteforce baseline)."""
    return f"""
SELECT e1.vec_id AS a, e2.vec_id AS b
FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= {tau}
ORDER BY a, b
"""


def knn_bruteforce_sql(query_ids: list[int], k: int) -> str:
    ids = ", ".join(str(int(q)) for q in query_ids)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN ({ids})),
sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def embed_corpus_sql(dim: int = 64) -> str:
    """Invariant oracle for the feature-hash embedder: constant dim and
    exact unit l2 norm for every non-empty document (zero vector, norm 0,
    for empty ones). The vector VALUES are checked by golden/cosine unit
    tests instead (float lists are not a stable hash surface)."""
    return f"""
SELECT doc_id, {dim} AS dim,
       CASE WHEN length(regexp_extract_all(text, '\\S+')) > 0
            THEN 1.0 ELSE 0.0 END AS norm
FROM documents ORDER BY doc_id
"""


def drop_late_events_sql(
    window_s: int = 300, allowed_lateness_s: int = 60, max_delay_s: int = 600
) -> str:
    """Mirror of pipelines.events.drop_late_events (arrival = ts + Knuth
    delay; late iff arrival > window close + allowed lateness)."""
    from shaclapi_ray.pipelines.events import LATE_KNUTH

    return f"""
SELECT event_id,
       (epoch_us(ts) // ({window_s} * 1000000)) * {window_s} AS window_start,
       ((event_id * {LATE_KNUTH}) % 4294967296) % {max_delay_s} AS delay_s,
       ((epoch_us(ts) // 1000000) + delay_s)
         > window_start + {window_s} + {allowed_lateness_s} AS late
FROM events ORDER BY event_id
"""


def tumbling_window_sql(window_s: int) -> str:
    return f"""
SELECT user_id,
       (epoch_us(ts) // ({window_s} * 1000000)) * {window_s} AS window_start,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY user_id, window_start ORDER BY user_id, window_start
"""


def hopping_window_sql(window_s: int, hop_s: int) -> str:
    k = window_s // hop_s
    return f"""
SELECT user_id,
       ((epoch_us(ts) // ({hop_s} * 1000000)) - r.i) * {hop_s} AS window_start,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events CROSS JOIN range({k}) AS r(i)
GROUP BY user_id, window_start ORDER BY user_id, window_start
"""


def assign_sessions_sql(gap_s: int) -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS ts_s,
         CASE WHEN lag(epoch_us(ts) // 1000000) OVER w IS NULL
                OR (epoch_us(ts) // 1000000) - (lag(epoch_us(ts) // 1000000) OVER w) > {gap_s}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM e ORDER BY event_id
"""


def sessionize_sql(gap_s: int) -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS ts_s,
         CASE WHEN lag(epoch_us(ts) // 1000000) OVER w IS NULL
                OR (epoch_us(ts) // 1000000) - (lag(epoch_us(ts) // 1000000) OVER w) > {gap_s}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts_s,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM e
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts_s) AS first_ts_s, max(ts_s) AS last_ts_s
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def attribute_events_sql(left_type: str = "click", right_type: str = "purchase") -> str:
    """As-of join oracle. Deliberately NOT DuckDB's ASOF JOIN: its tie
    order at equal timestamps is unspecified, so the lateral spells out
    the contract (latest ts, then largest event_id; unmatched -> -1)."""
    return f"""
SELECT p.event_id,
       coalesce(m.event_id, -1) AS matched_event_id,
       coalesce(date_diff('microsecond', m.ts, p.ts), -1) AS lag_us
FROM events p
LEFT JOIN LATERAL (
  SELECT c.event_id, c.ts FROM events c
  WHERE c.user_id = p.user_id AND c.event_type = '{left_type}' AND c.ts <= p.ts
  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
) m ON true
WHERE p.event_type = '{right_type}'
ORDER BY p.event_id
"""


def parse_props_sql() -> str:
    return (
        "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k "
        "FROM events ORDER BY event_id"
    )


def event_type_stats_sql() -> str:
    return """
SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value,
       round(min(value), 6) AS min_value, round(max(value), 6) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def media_metadata_sql(pages_dir: str) -> str:
    return (
        f"SELECT url, octet_length(html) AS n_bytes FROM {pages_rel(pages_dir)} "
        "ORDER BY url NULLS FIRST"
    )


def reduce_schema_sql(shape_ids: list[str]) -> str:
    rows = " UNION ALL ".join(f"SELECT '{s}' AS shape_id" for s in sorted(shape_ids))
    return f"SELECT shape_id FROM ({rows}) ORDER BY shape_id"


def all_column_shapes() -> list[Shape]:
    return [
        url_shape(),
        fresh_page_shape(),
        lang_shape(),
        target_page_shape(),
        consistent_page_shape(),
    ]


def or_shape_verdicts_sql(pages_dir: str) -> str:
    return shape_verdicts_sql(or_shape(), pages_dir)


def quantile_filter_sql(q: float = 0.5, src: str = "documents") -> str:
    """Exact rank-defined per-lang quantile filter: keep docs whose token
    count strictly exceeds the ceil(q*n)-th smallest score in their lang."""
    return f"""
WITH s AS (
  SELECT doc_id, lang,
         length(regexp_extract_all(text, '{TOKEN_RE}'))::BIGINT AS score
  FROM {src}
),
thr AS (
  SELECT lang, min(score) AS thr FROM (
    SELECT lang, score,
           row_number() OVER (PARTITION BY lang ORDER BY score) AS rn,
           count(*) OVER (PARTITION BY lang) AS n
    FROM s
  ) WHERE rn = CAST(ceil({q} * n) AS BIGINT)
  GROUP BY lang
)
SELECT s.doc_id, s.lang, s.score FROM s JOIN thr USING (lang)
WHERE s.score > thr.thr ORDER BY s.doc_id
"""


def filter_hosts_sql(pages_dir: str, blocked_hosts) -> str:
    """Oracle for pipelines.extract.filter_hosts: the same subdomain-
    inclusive alternation regex over url_canonicalize's host."""
    import re

    alt = "|".join(re.escape(h.lower()) for h in sorted(blocked_hosts))
    return f"""
SELECT url, host, regexp_matches(host, '(^|\\.)({alt})$') AS blocked
FROM ({url_canonicalize_sql(pages_dir)}) ORDER BY url
"""


def _urlq_word_clause(blocked_words) -> str:
    import re

    if not blocked_words:
        return ""
    alt = "|".join(re.escape(w.lower()) for w in sorted(blocked_words))
    return f"\n   AND NOT regexp_matches(lower(url), '({alt})')"


def url_quality_sql(
    pages_dir: str,
    *,
    max_len: int = 2048,
    max_digit_pct: int = 50,
    max_slashes: int = 8,
    blocked_words=(),
) -> str:
    """Oracle for pipelines.extract.url_quality_filter: identical
    integer rules (the digit share is cross-multiplied, never a float
    ratio), every row reported, null urls zero-counted and kept=false
    (has_scheme coalesces to FALSE, and FALSE AND NULL = FALSE)."""
    return f"""
WITH s AS (
  SELECT url,
    COALESCE(length(url), 0) AS n_chars,
    COALESCE(length(url) - length(regexp_replace(url, '[0-9]', '', 'g')), 0)
      AS n_digits,
    COALESCE(length(url) - length(replace(url, '/', '')), 0) AS n_slashes,
    COALESCE(regexp_matches(url, '^https?://'), FALSE) AS has_scheme
  FROM {pages_rel(pages_dir)}
)
SELECT url, n_chars, n_digits, n_slashes,
  (has_scheme AND n_chars <= {int(max_len)}
   AND 100 * n_digits <= {int(max_digit_pct)} * n_chars
   AND n_slashes <= {int(max_slashes)}{_urlq_word_clause(blocked_words)}) AS kept
FROM s ORDER BY url
"""


def url_quality_rows_sql(
    src: str,
    *,
    max_len: int = 2048,
    max_digit_pct: int = 50,
    max_slashes: int = 8,
    blocked_words=(),
) -> str:
    """Full pages rows surviving the URL gate over the relation NAME
    ``src`` — the chain-composition variant (curate_pages' optional
    stage 0). Same integer rules as url_quality_sql inlined into one
    WHERE (null urls fail has_scheme and drop)."""
    return f"""
SELECT url, warc_ts, text FROM {src}
WHERE COALESCE(regexp_matches(url, '^https?://'), FALSE)
   AND COALESCE(length(url), 0) <= {int(max_len)}
   AND 100 * COALESCE(length(url) - length(regexp_replace(url, '[0-9]', '', 'g')), 0)
       <= {int(max_digit_pct)} * COALESCE(length(url), 0)
   AND COALESCE(length(url) - length(replace(url, '/', '')), 0) <= {int(max_slashes)}{_urlq_word_clause(blocked_words)}
"""
