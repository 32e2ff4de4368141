"""robots.txt-style allow/disallow gating over the pages table.

The crawl-politeness filter of a webtext pipeline: each host publishes
prefix rules (``Disallow: /cgi-bin`` / ``Allow: /cgi-bin/public``) and a
page survives iff the LONGEST rule prefix matching its path is an allow
(no matching rule -> allowed) — the Google robots.txt matching rule
(REP, RFC 9309 §2.2.2: longest-match wins, allow wins length ties).
The reference never fetches pages (it consumes SPARQL bindings), so
this has no reference analog; it is part of the web-curation family
(extract/filter_hosts/url_quality, SURVEY.md §2.2's filter surface).

Semantics
---------
* Host/scheme parsing is IDENTICAL to ``extract.url_canonicalize``
  (same regex literals): fragment stripped, scheme+host lowercased,
  default port dropped. Rules match on that canonical host, EXACT
  equality (robots is per-host, not per-registrable-domain — the
  subdomain-inclusive gate is ``filter_hosts``).
* ``path`` is the fragment-stripped url minus scheme+authority with NO
  trailing-slash normalization (robots prefixes are literal); an empty
  path on an absolute url is ``/``. Non-absolute urls have host '' and
  path '' — no rule can match them, so they pass (robots governs
  fetching; a url we cannot resolve to a host has no robots.txt).
* Rows with null url are dropped (same contract as url_canonicalize /
  link extraction); every other row is reported with its verdict so the
  output joins 1:1 against the crawl manifest.
* Winner among matching rules: max ``(2*len(prefix) + is_allow,
  prefix)`` — length first, allow beats disallow at equal length, and
  the lexicographically largest prefix breaks exact-score ties
  deterministically on BOTH execution paths and in the SQL oracle.

Scale
-----
Rule sets are per-host and small in aggregate (one robots.txt per
host); the broadcast path ships the compiled rule arrays once inside
the serialized stage closure and streams the narrow url projection —
row-local, no shuffle. Above ``RULES_BROADCAST_LIMIT`` distinct rules
(planet-scale crawl: 1e8+ hosts), ``strategy='join'`` keeps the rules
a Dataset and resolves matches with ONE hash-partitioned inner join on
host followed by a keyed max — no whole-rule-set state anywhere.
Forced-join tests pin the two paths output-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from shaclapi_ray.pipelines.extract import (
    AUTHORITY_RE,
    HOSTPORT_RE,
    SCHEME_RE,
)

# broadcast ceiling: ~60 bytes/rule -> ~300 MB in every worker heap
RULES_BROADCAST_LIMIT = 5_000_000


def _norm_rules(rules) -> list[tuple[str, str, str]]:
    """Validate + normalize a rule sequence: (host lowered, directive
    in {'allow','disallow'}, prefix). Sorted by the winner order
    (score asc, prefix asc) so a later match always beats an earlier
    one — the broadcast kernel just overwrites."""
    out = []
    for host, directive, prefix in rules:
        d = directive.lower()
        if d not in ("allow", "disallow"):
            raise ValueError(f"directive must be allow/disallow, got {directive!r}")
        if not host:
            raise ValueError("rule host must be non-empty")
        out.append((host.lower(), d, prefix))
    out.sort(key=lambda r: (2 * len(r[2]) + (r[1] == "allow"), r[2]))
    return out


def _host_path(batch: pa.Table, url_col: str) -> pa.Table:
    """(url, host, path) per row, null urls dropped — the shared parse
    kernel of both strategies (regex literals shared with
    url_canonicalize and the DuckDB oracle)."""
    import polars as pl

    batch = batch.filter(pc.is_valid(batch[url_col]))
    df = pl.from_arrow(batch.select([url_col]))
    frag = pl.col(url_col).str.replace(r"#.*$", "")
    df = df.with_columns(
        frag.str.extract(SCHEME_RE, 1).str.to_lowercase().alias("scheme"),
        frag.str.extract(HOSTPORT_RE, 1).str.to_lowercase().alias("hostport"),
        frag.str.replace(AUTHORITY_RE, "").alias("rawpath"),
    )
    parseable = pl.col("scheme").is_not_null() & (pl.col("scheme") != "")
    host = (
        pl.when(pl.col("scheme") == "http")
        .then(pl.col("hostport").str.replace(r":80$", ""))
        .when(pl.col("scheme") == "https")
        .then(pl.col("hostport").str.replace(r":443$", ""))
        .otherwise(pl.col("hostport"))
    )
    out = df.select(
        pl.col(url_col).alias("url"),
        pl.when(parseable).then(host).otherwise(pl.lit("")).alias("host"),
        pl.when(~parseable)
        .then(pl.lit(""))
        .when(pl.col("rawpath") == "")
        .then(pl.lit("/"))
        .otherwise(pl.col("rawpath"))
        .alias("path"),
    )
    return out.to_arrow()


def _rule_wkey(directive: str, prefix: str) -> str:
    score = 2 * len(prefix) + (directive == "allow")
    return f"{score:010d}|{directive}:{prefix}"


def _decode_winners(hp: pa.Table, wkey: np.ndarray) -> pa.Table:
    """(url, host, path, allowed, rule) from the parse table + the
    per-row winner key ('' = no matching rule -> allowed)."""
    matched = wkey != ""
    rule = np.where(matched, [w[11:] for w in wkey], "")
    allowed = ~matched | np.char.startswith(rule.astype(str), "allow:")
    return pa.table(
        {
            "url": hp["url"],
            "host": hp["host"],
            "path": hp["path"],
            "allowed": pa.array(allowed.tolist(), type=pa.bool_()),
            "rule": pa.array(rule.tolist(), type=pa.string()),
        }
    )


def robots_filter(pages_ds, rules, *, url_col: str = "url",
                  strategy: str = "broadcast"):
    """(url, host, path, allowed, rule) for every non-null-url page.

    ``rules``: sequence of (host, directive, prefix) tuples, or a
    Dataset with columns (host, directive, prefix) for
    ``strategy='join'``. ``rule`` is ``'directive:prefix'`` of the
    winning rule, '' when no rule matched.
    """
    import ray
    import ray.data

    if strategy == "broadcast":
        if isinstance(rules, ray.data.Dataset):
            mat = rules.materialize()
            if mat.count() > RULES_BROADCAST_LIMIT:
                raise ValueError(
                    f"{mat.count()} rules exceed RULES_BROADCAST_LIMIT "
                    f"({RULES_BROADCAST_LIMIT}); use strategy='join'"
                )
            tbl = pa.concat_tables([ray.get(r) for r in mat.to_arrow_refs()])
            rules = list(
                zip(
                    tbl["host"].to_pylist(),
                    tbl["directive"].to_pylist(),
                    tbl["prefix"].to_pylist(),
                )
            )
        if len(rules) > RULES_BROADCAST_LIMIT:
            raise ValueError(
                f"{len(rules)} rules exceed RULES_BROADCAST_LIMIT "
                f"({RULES_BROADCAST_LIMIT}); use strategy='join'"
            )
        norm = _norm_rules(rules)

        def fn(batch: pa.Table) -> pa.Table:
            hp = _host_path(batch, url_col)
            if hp.num_rows == 0:
                return _decode_winners(hp, np.array([], dtype=object))
            host = hp["host"].to_numpy(zero_copy_only=False).astype(str)
            path = hp["path"].to_numpy(zero_copy_only=False).astype(str)
            best = np.full(hp.num_rows, "", dtype=object)
            # norm is ascending by (score, prefix): a later matching
            # rule is always a better winner, so plain overwrite
            # implements longest-match + allow-tie + lexicographic tie
            for rhost, rdir, rprefix in norm:
                m = (host == rhost) & np.char.startswith(path, rprefix)
                if m.any():
                    best[m] = _rule_wkey(rdir, rprefix)
            return _decode_winners(hp, best)

        return pages_ds.map_batches(fn, batch_format="pyarrow",
                                    zero_copy_batch=True)

    if strategy == "join":
        from shaclapi_ray.stages.aggregates import combine_partials_multi
        from shaclapi_ray.stages.joins import drop_empty_blocks
        from shaclapi_ray.stages.referential import clamp_partitions

        if not isinstance(rules, ray.data.Dataset):
            norm = _norm_rules(rules)
            rules = ray.data.from_arrow(
                pa.table(
                    {
                        "host": pa.array([r[0] for r in norm], pa.string()),
                        "directive": pa.array([r[1] for r in norm], pa.string()),
                        "prefix": pa.array([r[2] for r in norm], pa.string()),
                    }
                )
            )

        def norm_rule_batch(t: pa.Table) -> pa.Table:
            import polars as pl

            df = pl.from_arrow(t.select(["host", "directive", "prefix"]))
            df = df.select(
                pl.col("host").str.to_lowercase(),
                pl.col("directive").str.to_lowercase(),
                pl.col("prefix"),
            )
            d = df["directive"]
            bad = ~d.is_in(["allow", "disallow"])
            if bad.any():
                raise ValueError(
                    f"directive must be allow/disallow, got "
                    f"{df.filter(bad)['directive'][0]!r}"
                )
            plen = df["prefix"].str.len_chars().cast(pl.Int64)
            score = 2 * plen + (d == "allow").cast(pl.Int64)
            wkey = (
                score.cast(pl.String).str.zfill(10)
                + "|" + d + ":" + df["prefix"]
            )
            return df.with_columns(wkey.alias("wkey")).to_arrow()

        rules_nb = drop_empty_blocks(
            rules.map_batches(norm_rule_batch, batch_format="pyarrow")
        )
        hp = pages_ds.map_batches(
            lambda b: _host_path(b, url_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def no_winners(ds):
            return ds.map_batches(
                lambda t: _decode_winners(
                    t, np.full(t.num_rows, "", dtype=object)
                ),
                batch_format="pyarrow",
            )

        if rules_nb is None:
            return no_winners(hp)

        hp_nb = drop_empty_blocks(hp)
        if hp_nb is None:
            return no_winners(hp)
        joined = hp_nb.join(
            rules_nb.rename_columns({"host": "_r_host"}),
            join_type="inner",
            num_partitions=clamp_partitions(None),
            on=("host",),
            right_on=("_r_host",),
        )

        def match_partial(t: pa.Table) -> pa.Table:
            """Per-batch (url, wkey-max) over prefix-matching rules."""
            import polars as pl

            if t.num_rows == 0:
                return pa.table(
                    {
                        "url": pa.array([], pa.string()),
                        "wkey": pa.array([], pa.string()),
                    }
                )
            df = pl.from_arrow(t.select(["url", "path", "prefix", "wkey"]))
            df = df.filter(
                pl.col("path").str.starts_with(pl.col("prefix"))
            )
            out = df.group_by("url").agg(pl.col("wkey").max())
            return out.select(["url", "wkey"]).to_arrow()

        winners = combine_partials_multi(
            joined.map_batches(match_partial, batch_format="pyarrow"),
            keys=["url"],
            sums={"wkey": "max"},
        )
        win_nb = drop_empty_blocks(winners)
        if win_nb is None:
            return no_winners(hp)
        # LEFT side must be the empty-block-dropped hp_nb too: Ray's hash
        # shuffle resolves the join schema from whichever bundle a
        # partition aggregator sees first, and a schema-less empty block
        # (Repartition emits them) makes FieldRef('url') fail — racily,
        # per partition. Same rows either way (only 0-row blocks differ).
        out = hp_nb.join(
            win_nb.rename_columns({"url": "_w_url"}),
            join_type="left_outer",
            num_partitions=clamp_partitions(None),
            on=("url",),
            right_on=("_w_url",),
        )

        def decode(t: pa.Table) -> pa.Table:
            wk = t["wkey"].to_numpy(zero_copy_only=False)
            wk = np.array(["" if w is None else w for w in wk], dtype=object)
            return _decode_winners(t.select(["url", "host", "path"]), wk)

        return out.map_batches(decode, batch_format="pyarrow")

    raise ValueError(f"unknown strategy {strategy!r}")
