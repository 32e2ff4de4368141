"""Registrable-domain (eTLD+1) extraction over the pages table.

Host-level curation at crawl scale groups by *registrable domain*, not
raw host — ``a.blogspot.com`` and ``b.blogspot.com`` are different
publishers while ``news.bbc.co.uk`` and ``www.bbc.co.uk`` are the same
one. The grouping key is the public-suffix rule (publicsuffix.org):
the longest matching public suffix plus one more label.

The reference never parses urls (SPARQL bindings engine) — this is part
of the web-curation family (extract / filter_hosts / host_curation,
SURVEY.md §2.2's filter surface); ``host_curation`` and
``cap_per_host`` accept its output as the grouping key.

Semantics
---------
* Host parsing is the SHARED kernel of ``robots_filter`` /
  ``url_canonicalize`` (``robots._host_path``): fragment stripped,
  scheme+host lowercased, http/https default ports dropped, null urls
  dropped, unparseable urls get host ''. Any remaining ``:port`` is
  stripped before suffix logic (the PSL operates on hostnames).
* ``suffix``: the LONGEST entry of the suffix list matching the host on
  a label boundary (``host == s`` or ``host ENDS WITH '.' + s``); no
  match -> the last label (the PSL default ``*`` rule). Empty host and
  IPv4-literal hosts -> '' (IPs have no registrable domain).
* ``domain``: suffix plus one leading label; '' when the host IS a bare
  suffix (nothing registered) or suffix is ''.

The embedded ``DEFAULT_SUFFIXES`` is a documented, pluggable SUBSET of
the public suffix list (the full PSL is a fetched artifact — no network
in this environment); pass ``suffixes=`` to supply a fuller list. The
kernel handles entries of any label depth.

Scale: row-local streaming pass over the url projection only — the
suffix set ships once inside the serialized stage closure (a few KB for
the real PSL's ~10k rules), no shuffle, no state.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from shaclapi_ray.pipelines.robots import _host_path

# Documented subset of publicsuffix.org (country 2-level registries the
# crawl actually hits); pluggable via suffixes=.
DEFAULT_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "gob.mx", "org.mx",
    "com.ar", "com.tr", "com.sg", "com.hk", "com.tw", "com.my",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "co.za", "org.za", "web.za",
    "com.pl", "net.pl", "org.pl",
)

_IP_RE = r"^\d{1,3}(\.\d{1,3}){3}$"


def _empty_out() -> pa.Table:
    return pa.table(
        {c: pa.array([], pa.string()) for c in ("url", "host", "suffix", "domain")}
    )


def registrable_domain(pages_ds, *, url_col: str = "url",
                       suffixes=DEFAULT_SUFFIXES):
    """(url, host, suffix, domain) per non-null-url page.

    Membership and selection run in numpy against suffix arrays built
    ONCE on the driver and captured in the closure (zero per-task
    build, the stages/hashset.py convention); polars only evaluates the
    string/list expressions — its literal-parsing path (``is_in`` on a
    Python list) constructs Series inside the worker and has proven
    racy under fresh-worker import."""
    import numpy as np

    by_k: dict[int, set[str]] = {}
    for s in suffixes:
        s = s.lower().strip(".")
        if not s:
            raise ValueError("empty suffix entry")
        by_k.setdefault(s.count(".") + 1, set()).add(s)
    ks = sorted(by_k)  # ascending: longer matches overwrite shorter
    sfx_arr = {k: np.sort(np.array(sorted(by_k[k]))) for k in ks}
    # tail lengths needed: every suffix depth for matching, plus one
    # more label for the domain of each possible suffix depth
    tails_needed = sorted({1, 2, *ks, *(k + 1 for k in ks)})

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        hp = _host_path(batch, url_col)
        if hp.num_rows == 0:
            return _empty_out()
        df = pl.from_arrow(hp.select(["url", "host"]))
        df = df.with_columns(
            pl.col("host").str.replace(r":\d+$", "").alias("host")
        )
        labels = pl.col("host").str.split(".")
        n_expr = labels.list.len().cast(pl.Int64)
        cols = [n_expr.alias("_n")]
        for k in tails_needed:
            cols.append(
                labels.list.slice(n_expr - k, k).list.join(".").alias(f"_t{k}")
            )
        t = df.with_columns(cols).to_arrow()

        host = t["host"].to_numpy(zero_copy_only=False).astype(str)
        n = t["_n"].to_numpy(zero_copy_only=False)
        tails = {
            k: t[f"_t{k}"].to_numpy(zero_copy_only=False).astype(str)
            for k in tails_needed
        }
        # default rule: last label; longer list matches overwrite
        sfx = tails[1].copy().astype(object)
        klab = np.ones(len(host), dtype=np.int64)
        for k in ks:
            m = (n >= k) & np.isin(tails[k], sfx_arr[k])
            sfx[m] = tails[k][m]
            klab[m] = k
        bad = (host == "") | (
            pc.match_substring_regex(t["host"], _IP_RE)
            .to_numpy(zero_copy_only=False)
        )
        sfx[bad] = ""
        klab[bad] = 0
        domain = np.full(len(host), "", dtype=object)
        # sfx == '' also happens for a trailing-dot host ('a.b.' -> empty
        # last label): no registrable domain, same as the SQL's
        # suffix='' branch
        sfx_s = sfx.astype(str)
        reg = ~bad & (sfx_s != "") & (host != sfx_s)
        for k in [1, *ks]:
            m = reg & (klab == k)
            if m.any():
                domain[m] = tails[k + 1][m]
        return pa.table(
            {
                "url": t["url"],
                "host": t["host"],
                "suffix": pa.array(sfx.tolist(), pa.string()),
                "domain": pa.array(domain.tolist(), pa.string()),
            }
        )

    return pages_ds.map_batches(fn, batch_format="pyarrow",
                                zero_copy_batch=True)
